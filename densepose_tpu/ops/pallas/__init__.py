from .nms_kernel import nms_keep_pallas  # noqa: F401
