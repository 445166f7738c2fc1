from .boxes import iou_matrix, nms_indices, strict_overlap_matrix  # noqa: F401
from .sessionize import gap_sessionize  # noqa: F401
from .ctc import ctc_decode_np  # noqa: F401
from .page import extract_page_np  # noqa: F401
from .textstrip import strip_blocks  # noqa: F401
