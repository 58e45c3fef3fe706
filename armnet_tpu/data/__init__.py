from armnet_tpu.data.libsvm import LibsvmDataset, BatchIterator, make_dataloaders, parse_libsvm
