"""Training system: state, jitted sharded train step, checkpointing, agent.

Functional re-design of the reference `TrainAgent`
(`/root/reference/src/train.py:32-307`): the whole optimization step — both
forwards (base + warped view), all three loss families, gradient psum over the
data mesh axis, optimizer update, BN-stat sync — is ONE jitted program; the
python loop just feeds batches and logs.
"""

from yolopoint_tpu.training.state import TrainState, create_train_state, shrink_perturb
from yolopoint_tpu.training.step import LossWeights, make_train_step
