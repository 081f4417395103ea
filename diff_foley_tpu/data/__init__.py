from .ldm_dataset import SpecFeatDataset, LDMDataConfig
from .loader import PrefetchLoader, shard_indices
