from armnet_tpu.ops.entmax import entmax_bisect, sparsemax_bisect, sparse_normalizer
from armnet_tpu.ops.embedding import embedding_bag, scaled_embedding_lookup
from armnet_tpu.ops import initializers
