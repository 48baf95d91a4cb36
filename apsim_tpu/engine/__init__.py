from .engine import Engine
from .output import OutputBatcher, PairResult, SimilarityOutput
