"""Data pipeline: host-side IO/decoding + device-side augmentation.

Split of responsibilities (SURVEY.md §7 step 5 design stance):
* host (`datasets.py`, `loader.py`): image decode, resize/letterbox/crop,
  mosaic composition, label IO — cheap, python/numpy, prefetched.
* device (`photometric.py`, `augmentation.py`): photometric + homographic
  augmentation, warped-pair generation, valid masks, label-map rasterization —
  batched jnp inside the jitted train step (the reference does all of this
  per-sample on CPU dataloader workers,
  `/root/reference/src/datasets/DataClasses.py:159-454`).
"""
