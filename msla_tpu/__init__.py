"""msla_tpu — TPU-native multi-source audio LM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
``deborahdore/multi-source-lms-for-audio``: a Conv1D VQ-VAE for 4-stem
(bass/drums/guitar/piano) Slakh2100 source separation through a discrete
bottleneck, a Transformer decoder over quantized latents, a BERT masked-LM
over codebook indices, plus the training harness, config system, data
pipeline, observability, generation and visualization around them.
"""

__version__ = "0.1.0"
