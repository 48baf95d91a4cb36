from .sparse import DenseVector, SparseVector, Vectors, format_vector, parse_vector
from .batch import CSRMatrix, PaddedBatch, round_up
