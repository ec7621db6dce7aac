from .checkpoint import CheckpointManager, average_checkpoints  # noqa: F401
from .loop import Trainer  # noqa: F401
