from transcar_tpu.models.detector import TransCARDetector, build_model

__all__ = ["TransCARDetector", "build_model"]
