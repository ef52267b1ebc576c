from vision_tpu.datasets._small import (
    DTD,
    GTSRB,
    SEMEION,
    STL10,
    SUN397,
    SVHN,
    USPS,
    Caltech101,
    Caltech256,
    Country211,
    EuroSAT,
    FGVCAircraft,
    Flowers102,
    Food101,
    Imagenette,
    OxfordIIITPet,
    RenderedSST2,
)
from vision_tpu.datasets.cifar import CIFAR10, CIFAR100
from vision_tpu.datasets.coco import CocoCaptions, CocoDetection, COCOIndex
from vision_tpu.datasets.fakedata import FakeData
from vision_tpu.datasets.folder import (
    DatasetFolder,
    ImageFolder,
    find_classes,
    make_dataset,
)
from vision_tpu.datasets.imagenet import ImageNet
from vision_tpu.datasets.mnist import KMNIST, MNIST, FashionMNIST
from vision_tpu.datasets.samplers import (
    DataLoader,
    DistributedSampler,
    RandomClipSampler,
    UniformClipSampler,
    default_collate,
)
from vision_tpu.datasets.vision import StandardTransform, VisionDataset
from vision_tpu.datasets.voc import VOCDetection, VOCSegmentation

__all__ = [
    "CIFAR10",
    "CIFAR100",
    "Caltech101",
    "Caltech256",
    "Country211",
    "DTD",
    "EuroSAT",
    "FGVCAircraft",
    "Flowers102",
    "Food101",
    "GTSRB",
    "Imagenette",
    "OxfordIIITPet",
    "RenderedSST2",
    "SEMEION",
    "STL10",
    "SUN397",
    "SVHN",
    "USPS",
    "COCOIndex",
    "CocoCaptions",
    "CocoDetection",
    "DataLoader",
    "DatasetFolder",
    "DistributedSampler",
    "FakeData",
    "FashionMNIST",
    "ImageFolder",
    "ImageNet",
    "KMNIST",
    "MNIST",
    "RandomClipSampler",
    "StandardTransform",
    "UniformClipSampler",
    "VOCDetection",
    "VOCSegmentation",
    "VisionDataset",
    "default_collate",
    "find_classes",
    "make_dataset",
]
