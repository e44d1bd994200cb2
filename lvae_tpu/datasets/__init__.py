from lvae_tpu.datasets.image import (
    ImageDataset, get_image_dateset, get_image_dataset, parse_transform_cfg,
)
from lvae_tpu.datasets.loader import make_trainloader, ShardedSampler
from lvae_tpu.datasets.video import Vimeo90k
