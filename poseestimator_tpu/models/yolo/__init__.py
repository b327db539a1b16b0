"""YOLO11-seg, TPU-native: flax graph, decode, NMS, masks, weight import.

Replaces the Ultralytics/PyTorch dependency of the reference (Detector.py,
detection_utils.py, detection/train.py — SURVEY.md section 2.2).
"""
from .decode import bbox2dist, decode_boxes, dfl_expectation, dist2bbox, make_anchors
from .layers import C2PSA, C3k, C3k2, ConvBNAct, SPPF, Attention, Bottleneck, PSABlock
from .masks import assemble_masks, masks_to_polygons, polygon_to_mask
from .model import SCALES, YOLO11Seg, make_divisible
from .nms import Detections, box_iou, nms
from .preprocess import LetterboxMeta, boxes_to_original, letterbox
from .weights import (
    load_checkpoint,
    state_dict_to_variables,
    translate_key,
    variables_to_state_dict,
)
