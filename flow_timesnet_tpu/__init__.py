"""flow-timesnet-tpu: TPU-native probabilistic demand forecasting framework.

A ground-up JAX/XLA/Pallas/pjit re-design with the capabilities of the
Flow-TimesNet reference pipeline (FFT-guided period folding + 2D Inception
CNN, series/static embeddings, low-rank temporal context, adaptive
Negative-Binomial head, train/predict/tune CLI).
"""

__version__ = "0.1.0"

from .config import PipelineConfig, WindowConfig, ModelConfig, DataConfig, TrainConfig  # noqa: F401
