from depth_completion_tpu.parallel.sharding import (
    shard_batch,
    shard_bundle,
    unet_tp_spec,
)

__all__ = ["shard_batch", "shard_bundle", "unet_tp_spec"]
