from transcar_tpu.utils.profiling import phase_timer, trace

__all__ = ["phase_timer", "trace"]
