"""depth_completion_tpu — TPU-native guided-diffusion depth completion.

A from-scratch JAX/XLA/Pallas framework with the capability surface of the
Marigold-DC reference (tier4/depth_completion): sparse→dense metric depth via
latent diffusion with per-step anchor-point guidance, plus dataset IO, batch
inference, evaluation, visualization, and multi-host mesh scaling.

The reference is a single-GPU PyTorch/diffusers application
(/root/reference/marigold_dc.py, predict.py, analyze.py, utils.py); this
package re-designs the same behavior TPU-first: the entire guided sampling
loop is one jit-compiled `lax.scan`, models are pure-function pytrees, and
parallelism is expressed with `jax.sharding.Mesh` + NamedSharding.
"""

__version__ = "0.1.0"
