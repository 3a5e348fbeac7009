from .resize import (  # noqa: F401
    resize_bilinear,
    upsample2x_nearest,
    resize_nearest,
)
from .conv import (  # noqa: F401
    conv2d,
    conv_transpose2d,
    max_pool2d,
    linear,
)
from .norms import (frozen_batch_norm, group_norm, fold_frozen_bn,  # noqa: F401
                    cycle_batch_norm)  # noqa: F401
from .boxes import (  # noqa: F401
    clip_boxes_wh_swapped,
    clip_boxes,
    apply_deltas,
    boxes_area,
    nonempty_boxes,
    pairwise_iou,
)
from .nms import nms_mask, batched_nms_mask  # noqa: F401
from .roi_align import roi_align_multilevel, roi_align_single  # noqa: F401
from .anchors import generate_cell_anchors, grid_anchors  # noqa: F401
