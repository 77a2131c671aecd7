"""mdt_policy_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework with the
capabilities of `intuitive-robots/mdt_policy` (MDT: Multimodal Diffusion Transformer,
RSS 2024).

Design stance (see SURVEY.md §7): pure functional model cores, a single jitted
train step compiled once over a device mesh, `lax.scan` diffusion samplers, and
on-device preprocessing. This is a re-architecture, not a port: the reference's
PyTorch-Lightning/Hydra object graph is replaced by explicit functional state.

Layout:
  diffusion/   EDM noise schedules, sigma densities, Karras preconditioner,
               lax.scan sampler suite (reference: mdt/models/edm_diffusion/)
  models/      transformer blocks, MDT(-V) denoiser transformers, perceiver
               resampler, masked foresight decoder, perceptual encoders
               (reference: mdt/models/networks/, img_generation/, perceptual_encoders/)
  agents/      functional MDT/MDT-V agents: losses, train/val steps, inference
               protocol reset()/step() (reference: mdt/models/mdt(v)_agent.py)
  parallel/    mesh + sharding helpers (reference used PL-DDP/NCCL; here a
               jax.sharding.Mesh with XLA collectives over ICI)
  data/        CALVIN episode pipeline, window sampling, on-device transforms
               (reference: mdt/datasets/)
  evaluation/  CALVIN chain generator, deterministic initial states, rollout
               drivers (reference: mdt/evaluation/)
  utils/       fnv1_32 (C++ ext + Python fallback), EMA, tri-stage schedule,
               checkpointing
"""

__version__ = "0.1.0"
