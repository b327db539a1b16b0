"""models: neural network model families (YOLO11 detection/segmentation)."""
from . import yolo
