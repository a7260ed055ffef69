"""Dataset IO, prefix augmentation, and the host input pipeline."""

from sessionrec_tpu.data.io import read_dataset, read_sessions  # noqa: F401
from sessionrec_tpu.data.augment import AugmentedIndex  # noqa: F401
from sessionrec_tpu.data.loader import BatchLoader  # noqa: F401
