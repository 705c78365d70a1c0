from .checkpoint import (
    checkpoint_dataset, load_checkpoint, resumable_shards, run_with_checkpoint,
)

__all__ = ["checkpoint_dataset", "load_checkpoint", "resumable_shards",
           "run_with_checkpoint"]
