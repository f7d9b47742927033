from dcnet_tpu.utils.profiling import StepTimer, annotate, device_trace, trace_annotation
