from dcnet_tpu.ops.boxes import (
    bbox_iou,
    bbox_iou_pairwise,
    wh_iou,
    xywh2xyxy,
    xyxy2xywh,
)
from dcnet_tpu.ops.coords import generate_coord
from dcnet_tpu.ops.decode import (
    DecodedBoxes,
    decode_best,
    decode_indices,
    decode_topk,
    flatten_conf,
    flatten_scores,
    inverse_letterbox,
)
from dcnet_tpu.ops.target import CompactTarget, build_target
