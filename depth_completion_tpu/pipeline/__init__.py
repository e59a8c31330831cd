from depth_completion_tpu.pipeline.pipeline import DepthCompletionPipeline
from depth_completion_tpu.pipeline.sampler import SamplerConfig, guided_sample

__all__ = ["DepthCompletionPipeline", "SamplerConfig", "guided_sample"]
