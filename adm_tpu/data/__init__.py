from adm_tpu.data.cifar10 import CIFAR10
from adm_tpu.data.synthetic import ShapesDataset, ShapesPairedDataset, SyntheticImages
from adm_tpu.data.loader import batch_iterator
from adm_tpu.data.image_folder import (
    ImageDataset,
    ImageNetDataset,
    LSUNDataset,
    ImageMaskDataset,
)
from adm_tpu.data.paired import (
    ADE20KDataset,
    ImageNetSR,
    CityscapesDataset,
    DUTSDataset,
    EdgeDataset,
    InpaintDataset,
    NYUDv2DepthDataset,
    NYUDv2DepthDataset2,
    SketchDataset,
    SRDataset,
    SRDatasetTest,
)

__all__ = [
    "CIFAR10",
    "SyntheticImages",
    "ShapesDataset",
    "ShapesPairedDataset",
    "batch_iterator",
    "ImageDataset",
    "ImageNetDataset",
    "LSUNDataset",
    "ImageMaskDataset",
    "ADE20KDataset",
    "ImageNetSR",
    "CityscapesDataset",
    "DUTSDataset",
    "EdgeDataset",
    "InpaintDataset",
    "NYUDv2DepthDataset",
    "NYUDv2DepthDataset2",
    "SketchDataset",
    "SRDataset",
    "SRDatasetTest",
]
