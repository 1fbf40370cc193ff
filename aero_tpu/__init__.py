"""aero_tpu — a TPU-native (JAX/XLA/Pallas) audio super-resolution framework.

Re-implements the complete capability surface of the AERO reference
(audio bandwidth extension in the spectral domain, arXiv:2211.12232)
with a TPU-first design:

- ``ops``      — DSP primitives: framed STFT/iSTFT, polyphase resampling,
                 unfold; built on XLA/Pallas, no torch.
- ``models``   — Flax modules: the Aero spectral U-Net, the Seanet
                 time-domain baseline, MelGAN/HiFi-GAN discriminators.
- ``losses``   — multi-resolution STFT loss, adversarial losses.
- ``train``    — jitted GAN train step, epoch solver, checkpointing.
- ``parallel`` — device mesh construction and data-parallel sharding.
- ``data``     — egs-json datasets, WAV I/O, host→device prefetch.
- ``eval``     — LSD / ViSQOL metrics, enhancement artifact writer.
- ``utils``    — config system (Hydra-compatible tree), logging.
"""

__version__ = "0.1.0"
