from .nms import nms_padded, class_aware_nms
from .roi_align import multilevel_roi_align
from .mask_paste import paste_masks
