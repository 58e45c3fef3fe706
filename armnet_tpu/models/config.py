"""Model hyperparameter config mirroring the reference CLI surface
(/root/reference/train.py:15-50) so every `run.sh` recipe maps 1:1."""

import dataclasses


@dataclasses.dataclass
class ModelConfig:
    model: str = "armnet"
    nfeat: int = 5500        # total number of features (embedding rows)
    nfield: int = 10         # fields per example
    nemb: int = 10           # embedding size
    k: int = 3               # interaction order / depth for hofm/dcn/cin/gcn/gat/xdfm
    h: int = 128             # hidden features/neurons for afm/cin/afn/armnet/gcn/gat
    mlp_nlayer: int = 2
    mlp_nhid: int = 256
    dropout: float = 0.0
    nattn_head: int = 4      # attention heads for gat/armnet
    ensemble: bool = False   # ensemble with a DNN tower (afn/armnet/gc_arm/sa_glu)
    dnn_nlayer: int = 2
    dnn_nhid: int = 256
    alpha: float = 1.7       # entmax sparsity (1.0 => softmax, 2.0 => sparsemax)
    noutput: int = 1

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)
