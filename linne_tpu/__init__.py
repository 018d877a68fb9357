"""linne_tpu — TPU-native lossless audio codec framework (LINNE-compatible)."""

__version__ = "0.1.0"
