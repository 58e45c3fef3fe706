#!/usr/bin/env bash
# Fetch the UCI-121 dataset collection (numeric features + nominal class,
# ARFF + conxuntos.dat split files) used by the UCI multi-class path
# (armnet_tpu/data/uci.py). Equivalent of the reference's
# data/download_uci_datasets.sh. Requires network egress.
set -euo pipefail

URL="http://persoal.citius.usc.es/manuel.fernandez.delgado/papers/jmlr/data.tar.gz"

echo "downloading UCI-121 collection ..."
curl -fL "$URL" -o uci_data.tar.gz
tar -xzf uci_data.tar.gz
rm -f uci_data.tar.gz
echo "done; each folder holds <name>.arff + conxuntos.dat"
