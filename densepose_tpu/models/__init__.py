from .resnet import resnet_spec, resnet_forward, resnet_stage_blocks  # noqa: F401
from .fpn import fpn_spec, fpn_forward  # noqa: F401
from .rpn import rpn_spec, rpn_forward  # noqa: F401
from .roi_heads import roi_heads_spec, roi_heads_forward  # noqa: F401
from .rcnn import build_model, GeneralizedRCNN  # noqa: F401
