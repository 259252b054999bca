from transcar_tpu.eval.decode import nms_free_decode

__all__ = ["nms_free_decode"]
