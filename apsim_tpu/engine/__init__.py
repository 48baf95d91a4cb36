from .engine import Engine
from .output import OutputBatcher, PairResult, SimilarityOutput
from .chunked import ChunkedAllPairs
