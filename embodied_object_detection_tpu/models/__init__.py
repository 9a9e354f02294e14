from .resnet import ResNet50
from .fpn import RecurrentFPN
from .centernet import CenterNetHead, decode_proposals
from .roi_heads import CascadeROIHeads
from .detector import EmbodiedDetector, build_detector
