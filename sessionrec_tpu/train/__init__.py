"""Training runtime: jitted train/eval steps, optimizer, metrics, runner."""

from sessionrec_tpu.train.runner import TrainRunner  # noqa: F401
from sessionrec_tpu.train.optim import make_optimizer, step_lr  # noqa: F401
