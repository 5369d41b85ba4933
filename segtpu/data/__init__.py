"""Dataset registry — same loader names/ctor surface as the reference
(reference dataloaders/__init__.py:1-5): VOC, COCO, ADE20K, CityScapes,
DeepScene; plus Synthetic (the in-memory test/benchmark fixture that replaces
dataset downloads, SURVEY.md §4)."""

from segtpu.data.base import BaseDataset, DataLoader, DevicePrefetcher  # noqa: F401
from segtpu.data.voc import VOC
from segtpu.data.cityscapes import CityScapes
from segtpu.data.ade20k import ADE20K
from segtpu.data.coco import COCO
from segtpu.data.deepscene import DeepScene
from segtpu.data.synthetic import Synthetic

DATASETS = {
    "VOC": VOC,
    "COCO": COCO,
    "ADE20K": ADE20K,
    "CityScapes": CityScapes,
    "DeepScene": DeepScene,
    "Synthetic": Synthetic,
}


def get_loader(name: str, **kwargs):
    if name not in DATASETS:
        raise KeyError(f"unknown dataset {name!r}; available: {sorted(DATASETS)}")
    return DATASETS[name](**kwargs)


def dataset_meta(config):
    """(mean, std, palette, num_classes) from a training config WITHOUT the
    dataset on disk: manifest-backed loaders expose their stats
    declaratively; in-memory fixtures (Synthetic) are instantiated."""
    loader_cfg = config["train_loader"]
    cls = DATASETS[loader_cfg["type"]]
    cfg_args = loader_cfg.get("args", {})
    if hasattr(cls, "manifest"):
        extra = {k: cfg_args[k] for k in ("mode", "partition", "warp_image")
                 if k in cfg_args}
        m = cls.manifest(split=cfg_args.get("split", "train"), **extra)
        return m.mean, m.std, list(m.palette), m.num_classes
    loader = cls(**cfg_args)
    return (loader.MEAN, loader.STD, loader.dataset.palette,
            loader.dataset.num_classes)
