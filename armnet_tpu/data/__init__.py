from armnet_tpu.data.libsvm import LibsvmDataset, BatchIterator, make_dataloaders, parse_libsvm
from armnet_tpu.data.uci import UCIDataset, load_arff, load_uci_dataset, uci_loader
