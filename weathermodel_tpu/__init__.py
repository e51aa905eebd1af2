"""weathermodel_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
self-supervised weather-model pretraining and crop-yield fine-tuning.

Capability-equivalent rebuild of the Neehan/WeatherModel reference
(PyTorch/DDP, see /root/reference), redesigned TPU-first:

* one jitted train step containing on-device masking, forward, loss, grad,
  optimizer update, and data-parallel gradient mean over an ICI mesh;
* flax.linen functional models (WeatherBERT, WeatherFormer + sinusoid/mixture
  priors, autoencoder/SimMTM aliases, MLP/CNN/linear baselines, yield heads);
* Pallas fused attention over the fixed 365 x 31 sequences;
* orbax checkpointing, k-fold cross-validation, LR-range finder, grid search.
"""

__version__ = "0.1.0"
