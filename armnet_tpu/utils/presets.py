"""Canonical per-dataset hyperparameter recipes, reproducing the reference's
run.sh experiment scripts (/root/reference/run.sh) with its stale flag names
fixed (--nlayer/--mlp_hid/--dnn_hid there do not exist in the CLI; the real
flags are --mlp_nlayer/--mlp_nhid/--dnn_nhid — SURVEY.md §2 row 19).

Each preset is a list of CLI argument strings for train.py; `expand(name)`
returns the argv. Dataset geometry is included so recipes are self-contained.
"""

PRESETS = {
    # ---- ARM-Net (multi-head) ------------------------------------------
    "frappe_armnet": ["--model", "armnet", "--alpha", "2.0", "--h", "32",
                      "--nattn_head", "8", "--lr", "0.001"],
    "frappe_armnet+": ["--model", "armnet", "--ensemble", "--alpha", "1.5",
                       "--h", "4", "--nattn_head", "4", "--lr", "0.003"],
    "ml_armnet": ["--model", "armnet", "--h", "16", "--nattn_head", "1",
                  "--alpha", "2.0", "--lr", "0.001", "--nfield", "3",
                  "--nfeat", "92000", "--dataset", "movielens"],
    "ml_armnet+": ["--model", "armnet", "--ensemble", "--alpha", "2.5",
                   "--h", "8", "--nattn_head", "1", "--lr", "0.001",
                   "--nfield", "3", "--nfeat", "92000",
                   "--dataset", "movielens"],
    "av_armnet": ["--model", "armnet", "--mlp_nlayer", "3", "--mlp_nhid",
                  "200", "--h", "32", "--nattn_head", "1", "--alpha", "1.5",
                  "--lr", "0.001", "--nfield", "22", "--nfeat", "1600000",
                  "--dataset", "avazu", "--eval_freq", "1000"],
    "av_armnet+": ["--model", "armnet", "--mlp_nlayer", "3", "--mlp_nhid",
                   "200", "--dnn_nlayer", "3", "--dnn_nhid", "200",
                   "--ensemble", "--alpha", "2.0", "--h", "8",
                   "--nattn_head", "8", "--lr", "0.001", "--nfield", "22",
                   "--nfeat", "1600000", "--dataset", "avazu",
                   "--eval_freq", "1000"],
    "cr_armnet": ["--model", "armnet", "--mlp_nlayer", "2", "--mlp_nhid",
                  "500", "--h", "64", "--nattn_head", "4", "--alpha", "2.0",
                  "--lr", "0.001", "--nfield", "39", "--nfeat", "2100000",
                  "--dataset", "criteo"],
    "cr_armnet+": ["--model", "armnet", "--mlp_nhid", "500", "--mlp_nlayer",
                   "2", "--dnn_nlayer", "2", "--dnn_nhid", "500",
                   "--ensemble", "--alpha", "2.0", "--h", "32",
                   "--nattn_head", "4", "--lr", "0.003", "--nfield", "39",
                   "--nfeat", "2100000", "--dataset", "criteo"],
    "db_armnet": ["--model", "armnet", "--mlp_nlayer", "1", "--h", "1",
                  "--nattn_head", "32", "--alpha", "1.7", "--lr", "0.003",
                  "--batch_size", "1024", "--nfield", "43", "--nfeat", "369",
                  "--dataset", "uci_diabetes"],
    "db_armnet+": ["--model", "armnet", "--mlp_nlayer", "1", "--dnn_nlayer",
                   "1", "--ensemble", "--alpha", "1.5", "--h", "64",
                   "--nattn_head", "8", "--lr", "0.01", "--batch_size",
                   "1024", "--nfield", "43", "--nfeat", "369",
                   "--dataset", "uci_diabetes"],
    # ---- ARM-Net one-head ----------------------------------------------
    "frappe_armnet1h": ["--model", "armnet_1h", "--alpha", "2.0", "--h",
                        "128", "--lr", "0.001"],
    "frappe_armnet1h+": ["--model", "armnet_1h", "--ensemble", "--alpha",
                         "1.5", "--h", "128", "--lr", "0.003"],
    "ml_armnet1h": ["--model", "armnet_1h", "--h", "128", "--alpha", "2.0",
                    "--lr", "0.001", "--nfield", "3", "--nfeat", "92000",
                    "--dataset", "movielens"],
    "ml_armnet1h+": ["--model", "armnet_1h", "--ensemble", "--alpha", "2.5",
                     "--h", "128", "--lr", "0.001", "--nfield", "3",
                     "--nfeat", "92000", "--dataset", "movielens"],
    "av_armnet1h": ["--model", "armnet_1h", "--mlp_nlayer", "3", "--mlp_nhid",
                    "200", "--h", "128", "--alpha", "1.5", "--lr", "0.001",
                    "--nfield", "22", "--nfeat", "1600000", "--dataset",
                    "avazu", "--eval_freq", "1000"],
    "av_armnet1h+": ["--model", "armnet_1h", "--mlp_nlayer", "3",
                     "--mlp_nhid", "200", "--dnn_nlayer", "3", "--dnn_nhid",
                     "200", "--ensemble", "--alpha", "2.0", "--h", "128",
                     "--lr", "0.001", "--nfield", "22", "--nfeat", "1600000",
                     "--dataset", "avazu", "--eval_freq", "1000"],
    "cr_armnet1h": ["--model", "armnet_1h", "--mlp_nlayer", "2", "--mlp_nhid",
                    "500", "--h", "128", "--alpha", "2.0", "--lr", "0.001",
                    "--nfield", "39", "--nfeat", "2100000",
                    "--dataset", "criteo"],
    "cr_armnet1h+": ["--model", "armnet_1h", "--mlp_nhid", "500",
                     "--mlp_nlayer", "2", "--dnn_nlayer", "2", "--dnn_nhid",
                     "500", "--ensemble", "--alpha", "2.0", "--h", "128",
                     "--lr", "0.003", "--nfield", "39", "--nfeat", "2100000",
                     "--dataset", "criteo"],
    "db_armnet1h": ["--model", "armnet_1h", "--mlp_nlayer", "1", "--h", "128",
                    "--alpha", "1.7", "--lr", "0.003", "--batch_size", "1024",
                    "--nfield", "43", "--nfeat", "369",
                    "--dataset", "uci_diabetes"],
    "db_armnet1h+": ["--model", "armnet_1h", "--mlp_nlayer", "1",
                     "--dnn_nlayer", "1", "--ensemble", "--alpha", "1.5",
                     "--h", "128", "--lr", "0.01", "--batch_size", "1024",
                     "--nfield", "43", "--nfeat", "369",
                     "--dataset", "uci_diabetes"],
}


def expand(name):
    """Preset name -> train.py argv (plus --exp_name <name>)."""
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; known: {sorted(PRESETS)}")
    return list(PRESETS[name]) + ["--exp_name", name]
