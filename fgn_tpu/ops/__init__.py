from fgn_tpu.ops.boxes import (
    box_area,
    box_iou,
    box_iou_np,
    yxyx_to_xyxy,
    xyxy_to_yxyx,
    delta_encode,
    delta_decode,
)
from fgn_tpu.ops.anchors import generate_anchors, anchor_inside_flags
from fgn_tpu.ops.assign import max_iou_assign
from fgn_tpu.ops.sample import random_sample_pos_neg
from fgn_tpu.ops.nms import batched_nms, nms_padded
from fgn_tpu.ops.roi_align import roi_align
from fgn_tpu.ops.mask_paste import paste_masks
