from .anchors import (  # noqa: F401
    assign_anchor_classes_by_iou_with_bboxes,
    center_yxhw_to_corners,
    corners_to_center_yxhw,
    decode_bboxes,
    get_anchor_free_anchors,
    get_anchors,
    get_feature_sizes,
    iou_nd,
)
from .losses import focal_loss_with_bbox  # noqa: F401
from .nms import DecodePredictions, non_max_suppression  # noqa: F401
