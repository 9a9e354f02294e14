from .episode_dataset import EpisodeDataset, EpisodeChunk, sort_episode_files
from .synthetic import generate_synthetic_dataset
