"""Model registry: string name -> constructor, mirroring the reference factory
dispatch (/root/reference/models/model_utils.py:27-88) including which config
flag feeds which constructor argument (e.g. `--h` is AFM's nattn, CIN's
nfilter, ARM's exponential-neuron count; `--k` is HOFM's order, DCN/CIN/GCN/GAT
depth)."""

from armnet_tpu.models.afm import AFM
from armnet_tpu.models.afn import AFN
from armnet_tpu.models.afn import embedding_positivity as _afn_embedding_positivity
from armnet_tpu.models.armnet import ARMNet
from armnet_tpu.models.armnet_1h import ARMNet1H
from armnet_tpu.models.config import ModelConfig
from armnet_tpu.models.dcn import DCN, CrossNet
from armnet_tpu.models.dfm import DeepFM
from armnet_tpu.models.dnn import DNN
from armnet_tpu.models.fm import FM
from armnet_tpu.models.gat import GAT
from armnet_tpu.models.gc_arm import GCARM
from armnet_tpu.models.gcn import GCN
from armnet_tpu.models.hofm import HOFM
from armnet_tpu.models.lr import LR
from armnet_tpu.models.nfm import NFM
from armnet_tpu.models.pnn import IPNN, KPNN
from armnet_tpu.models.sa_glu import SAGLU
from armnet_tpu.models.wd import WideDeep
from armnet_tpu.models.xdfm import CIN, XDeepFM

_REGISTRY = {
    "lr": lambda c: LR(c.nfeat),
    "fm": lambda c: FM(c.nfeat, c.nemb),
    "hofm": lambda c: HOFM(c.nfeat, c.nemb, c.k),
    "afm": lambda c: AFM(c.nfeat, c.nemb, c.h, c.dropout),
    "dcn": lambda c: CrossNet(c.nfield, c.nfeat, c.nemb, c.k),
    "cin": lambda c: CIN(c.nfield, c.nfeat, c.nemb, c.k, c.h),
    "afn": lambda c: AFN(c.nfield, c.nfeat, c.nemb, c.h, c.mlp_nlayer,
                         c.mlp_nhid, c.dropout, c.ensemble, c.dnn_nlayer,
                         c.dnn_nhid, c.noutput),
    "armnet": lambda c: ARMNet(c.nfield, c.nfeat, c.nemb, c.nattn_head,
                               c.alpha, c.h, c.mlp_nlayer, c.mlp_nhid,
                               c.dropout, c.ensemble, c.dnn_nlayer, c.dnn_nhid,
                               c.noutput),
    "armnet_1h": lambda c: ARMNet1H(c.nfield, c.nfeat, c.nemb, c.alpha, c.h,
                                    c.nemb, c.mlp_nlayer, c.mlp_nhid,
                                    c.dropout, c.ensemble, c.dnn_nlayer,
                                    c.dnn_nhid, c.noutput),
    "dnn": lambda c: DNN(c.nfield, c.nfeat, c.nemb, c.mlp_nlayer, c.mlp_nhid,
                         c.dropout, c.noutput),
    "gcn": lambda c: GCN(c.nfield, c.nfeat, c.nemb, c.k, c.h, c.mlp_nlayer,
                         c.mlp_nhid, c.dropout, c.noutput),
    "gat": lambda c: GAT(c.nfield, c.nfeat, c.nemb, c.k, c.h, c.mlp_nlayer,
                         c.mlp_nhid, c.dropout, 0.2, c.nattn_head, c.noutput),
    "wd": lambda c: WideDeep(c.nfield, c.nfeat, c.nemb, c.mlp_nlayer,
                             c.mlp_nhid, c.dropout, c.noutput),
    "ipnn": lambda c: IPNN(c.nfield, c.nfeat, c.nemb, c.mlp_nlayer, c.mlp_nhid,
                           c.dropout, c.noutput),
    "kpnn": lambda c: KPNN(c.nfield, c.nfeat, c.nemb, c.mlp_nlayer, c.mlp_nhid,
                           c.dropout, c.noutput),
    "nfm": lambda c: NFM(c.nfeat, c.nemb, c.mlp_nlayer, c.mlp_nhid, c.dropout,
                         c.noutput),
    "dfm": lambda c: DeepFM(c.nfield, c.nfeat, c.nemb, c.mlp_nlayer,
                            c.mlp_nhid, c.dropout, c.noutput),
    "dcn+": lambda c: DCN(c.nfield, c.nfeat, c.nemb, c.k, c.mlp_nlayer,
                          c.mlp_nhid, c.dropout, c.noutput),
    "xdfm": lambda c: XDeepFM(c.nfield, c.nfeat, c.nemb, c.k, c.h,
                              c.mlp_nlayer, c.mlp_nhid, c.dropout, c.noutput),
    "gc_arm": lambda c: GCARM(c.nfield, c.nfeat, c.nemb, c.nattn_head, c.alpha,
                              c.h, c.mlp_nlayer, c.mlp_nhid, c.dropout,
                              c.ensemble, c.dnn_nlayer, c.dnn_nhid,
                              c.noutput),
    "sa_glu": lambda c: SAGLU(c.nfield, c.nfeat, c.nemb, c.mlp_nlayer,
                              c.mlp_nhid, c.dropout, c.ensemble, c.dnn_nlayer,
                              c.dnn_nhid, c.noutput),
}

MODEL_NAMES = tuple(sorted(_REGISTRY))

# per-step stored-parameter mutations, mirroring reference models that
# mutate weights outside autograd each forward (torch .data ops). The
# trainer applies these to state.params at the head of every train step
# (and once per eval pass) so gradient geometry matches the reference
# exactly.
_PARAM_TRANSFORMS = {"afn": _afn_embedding_positivity}


def param_transform_for(name):
    """The param mutation for a model name, or None."""
    return _PARAM_TRANSFORMS.get(name)


# models whose head is structurally a scalar (first/second-order sums with no
# MLP): binary-only, like the reference main branch
_SCALAR_ONLY = frozenset({"lr", "fm", "hofm", "afm", "dcn", "cin"})


def create_model(config: ModelConfig):
    """Build a flax model from a ModelConfig. Raises on unknown names."""
    name = config.model
    if name not in _REGISTRY:
        raise ValueError(f"unknown model {name!r}; known: {MODEL_NAMES}")
    if getattr(config, "noutput", 1) > 1 and name in _SCALAR_ONLY:
        raise ValueError(
            f"model {name!r} has a scalar head and does not support "
            f"noutput={config.noutput} (multi-class); pick an MLP-headed "
            f"model (e.g. dnn/armnet/armnet_1h/...)")
    return _REGISTRY[name](config)


def param_count(params):
    """Total parameter scalar count (logged at model creation, like the
    reference's factory does)."""
    import jax

    return sum(int(p.size) for p in jax.tree.leaves(params))
