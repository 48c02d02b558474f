from mae_clip_tpu.utils.profiling import (StepTimer, annotate,
                                          start_profiler_server, trace)

__all__ = ["StepTimer", "annotate", "start_profiler_server", "trace"]
