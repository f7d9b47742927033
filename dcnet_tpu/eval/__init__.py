from dcnet_tpu.eval.metrics import AverageMeter, compute_ap, grounding_metrics, multiclass_metrics
