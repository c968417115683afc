from .anchors import (  # noqa: F401
    AnchorFreeAssignMatching,
    assign_anchor_classes_by_iou_with_bboxes,
    center_yxhw_to_corners,
    corners_to_center_yxhw,
    decode_bboxes,
    get_anchor_free_anchors,
    get_anchors,
    get_anchors_mode_by_anchors,
    get_anchors_mode_parameters,
    get_feature_sizes,
    get_pyramid_levels_by_anchors,
    get_yolor_anchors,
    iou_nd,
    yolor_assign_anchors,
)
from .losses import (  # noqa: F401
    YolorLossWithBbox,
    anchor_free_loss,
    bbox_iou,
    class_accuracy_with_bbox,
    focal_loss_with_bbox,
)
from .nms import DecodePredictions, non_max_suppression  # noqa: F401
from .data import (  # noqa: F401
    DetectionLoader,
    letterbox_resize,
    mosaic_mix_batch,
    pad_bboxes_labels,
    random_flip_left_right_with_bboxes,
    random_hsv,
)
from .eval import DetectionEvaluator, coco_map  # noqa: F401
