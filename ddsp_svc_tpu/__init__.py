"""DDSP-SVC-TPU: a TPU-native (JAX/XLA/Pallas/pjit) singing-voice-conversion framework.

A from-scratch re-design of the capabilities of yxlllc/DDSP-SVC for TPU hardware:
  - ``ops``      — pure-function DSP kernel library (jnp + Pallas TPU kernels)
  - ``models``   — flax.linen model zoo (DDSP synths, diffusion/reflow, NSF-HiFiGAN)
  - ``features`` — feature front-ends (f0, volume, units, mel)
  - ``data``     — preprocessing + dataset pipeline
  - ``train``    — pjit/sharded training harness
  - ``infer``    — offline & streaming inference engines
  - ``parallel`` — device mesh, sharding and halo-exchange streaming utilities
  - ``utils``    — config system, checkpointing, logging
"""

__version__ = "0.1.0"
