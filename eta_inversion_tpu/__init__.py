"""eta_inversion_tpu: TPU-native real-image editing with latent diffusion.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
furiosa-ai/eta-inversion (ECCV 2024): diffusion inversion methods, attention-
level editing, metrics, datasets and an evaluation harness — architected for
TPU (NHWC, lax.scan diffusion loops, Pallas flash attention, pjit sharding).
"""

__version__ = "0.1.0"
