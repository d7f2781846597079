from tpusfm.utils.profiling import profile, profiled, trace_to

__all__ = ["profile", "profiled", "trace_to"]
