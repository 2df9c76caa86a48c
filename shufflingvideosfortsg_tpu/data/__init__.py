from .masks import sequence_mask  # noqa: F401
from .pipeline import SentenceGroundingDataset, BatchLoader  # noqa: F401
