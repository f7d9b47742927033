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
from dcnet_tpu.ops.coattention import coattention_center, coattention_pair
from dcnet_tpu.ops.correspondence import (
    ContrastiveSamples, crossmodal_pairs, interframe_pairs,
)
from dcnet_tpu.ops.yolo_detect import (
    ObjectTargets, build_object_targets, coco_category_map, yolo_detections,
)
