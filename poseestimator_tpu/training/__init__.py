"""training: YOLO11-seg training on the TPU — dataset pipeline (reference
dataset.yaml contract), TAL assignment, BCE/CIoU/DFL/mask losses, Adam with
the reference's operating point, data-parallel mesh, orbax checkpoints."""
from .assigner import assign
from .data import Batch, DataLoader, DatasetSpec, list_samples, load_dataset_yaml, load_sample, parse_label_file
from .evaluate import ImageEval, compute_map, evaluate_detector
from .loss import bce, ciou, segmentation_loss
from .trainer import TrainConfig, Trainer, TrainState, train
