#!/usr/bin/env python
"""Fetch the preprocessed Criteo and Avazu libsvm archives.

Equivalent of the reference's data/download_critero_and_avazu.py (codalab
zip fetch + unzip into {dataset}/ folders); rewritten for this framework's
layout. Run from the repo's data/ directory:

    python download_criteo_and_avazu.py [criteo] [avazu]

After download the folders contain tr*/va*/te*libsvm shards matching the
loader's glob convention (armnet_tpu/data/libsvm.py). Requires network
egress; in an air-gapped environment place the files manually and the
loader picks them up unchanged.
"""

import os
import sys
import urllib.request
import zipfile

URLS = {
    # codalab bundles published by the ARM-Net authors (reference
    # data/download_critero_and_avazu.py:20-37)
    "criteo": "https://worksheets.codalab.org/rest/bundles/0x8dca5e7bac42470aa445f9a205d177c6/contents/blob/",
    "avazu": "https://worksheets.codalab.org/rest/bundles/0x0e8f86d0ed2848b1b4e9f4fbcb4790bd/contents/blob/",
}


def fetch(name):
    url = URLS[name]
    out_zip = f"{name}.zip"
    print(f"downloading {name} from {url} ...")
    urllib.request.urlretrieve(url, out_zip)
    os.makedirs(name, exist_ok=True)
    print(f"extracting {out_zip} -> {name}/")
    with zipfile.ZipFile(out_zip) as z:
        z.extractall(name)
    os.unlink(out_zip)
    print(f"{name} ready")


if __name__ == "__main__":
    targets = sys.argv[1:] or list(URLS)
    for t in targets:
        if t not in URLS:
            sys.exit(f"unknown dataset {t!r}; known: {sorted(URLS)}")
        fetch(t)
