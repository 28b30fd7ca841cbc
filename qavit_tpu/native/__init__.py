from qavit_tpu.native.loader import NativeBatchLoader, is_available

__all__ = ["NativeBatchLoader", "is_available"]
