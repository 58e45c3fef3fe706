#!/usr/bin/env bash
# Canonical benchmark recipes (reproducing the reference run.sh with its
# stale flag typos fixed). Each line is runnable as-is; presets also live in
# armnet_tpu/utils/presets.py.
set -e

# ARM-Net (multi-head)
python train.py --model armnet --alpha 2.0 --h 32 --nattn_head 8 --lr 0.001 --exp_name frappe_armnet
python train.py --model armnet --ensemble --alpha 1.5 --h 4 --nattn_head 4 --lr 0.003 --exp_name frappe_armnet+

python train.py --model armnet --h 16 --nattn_head 1 --alpha 2.0 --lr 0.001 --exp_name ML_armnet --nfield 3 --nfeat 92000 --dataset movielens
python train.py --model armnet --ensemble --alpha 2.5 --h 8 --nattn_head 1 --lr 0.001 --exp_name ML_armnet+ --nfield 3 --nfeat 92000 --dataset movielens

python train.py --model armnet --mlp_nlayer 3 --mlp_nhid 200 --h 32 --nattn_head 1 --alpha 1.5 --lr 0.001 --exp_name AV_armnet --nfield 22 --nfeat 1600000 --dataset avazu --eval_freq 1000
python train.py --model armnet --mlp_nlayer 3 --mlp_nhid 200 --dnn_nlayer 3 --dnn_nhid 200 --ensemble --alpha 2.0 --h 8 --nattn_head 8 --lr 0.001 --exp_name AV_armnet+ --nfield 22 --nfeat 1600000 --dataset avazu --eval_freq 1000

python train.py --model armnet --mlp_nlayer 2 --mlp_nhid 500 --h 64 --nattn_head 4 --alpha 2.0 --lr 0.001 --exp_name CR_armnet --nfield 39 --nfeat 2100000 --dataset criteo
python train.py --model armnet --mlp_nhid 500 --mlp_nlayer 2 --dnn_nlayer 2 --dnn_nhid 500 --ensemble --alpha 2.0 --h 32 --nattn_head 4 --lr 0.003 --exp_name CR_armnet+ --nfield 39 --nfeat 2100000 --dataset criteo

python train.py --model armnet --mlp_nlayer 1 --h 1 --nattn_head 32 --alpha 1.7 --lr 0.003 --batch_size 1024 --exp_name DB_armnet --nfield 43 --nfeat 369 --dataset uci_diabetes
python train.py --model armnet --mlp_nlayer 1 --dnn_nlayer 1 --ensemble --alpha 1.5 --h 64 --nattn_head 8 --lr 0.01 --batch_size 1024 --exp_name DB_armnet+ --nfield 43 --nfeat 369 --dataset uci_diabetes

# ARM-Net one-head (shared bilinear weight)
python train.py --model armnet_1h --alpha 2.0 --h 128 --lr 0.001 --exp_name frappe_armnet1h
python train.py --model armnet_1h --ensemble --alpha 1.5 --h 128 --lr 0.003 --exp_name frappe_armnet1h+

python train.py --model armnet_1h --h 128 --alpha 2.0 --lr 0.001 --exp_name ML_armnet1h --nfield 3 --nfeat 92000 --dataset movielens
python train.py --model armnet_1h --ensemble --alpha 2.5 --h 128 --lr 0.001 --exp_name ML_armnet1h+ --nfield 3 --nfeat 92000 --dataset movielens

python train.py --model armnet_1h --mlp_nlayer 3 --mlp_nhid 200 --h 128 --alpha 1.5 --lr 0.001 --exp_name AV_armnet1h --nfield 22 --nfeat 1600000 --dataset avazu --eval_freq 1000
python train.py --model armnet_1h --mlp_nlayer 3 --mlp_nhid 200 --dnn_nlayer 3 --dnn_nhid 200 --ensemble --alpha 2.0 --h 128 --lr 0.001 --exp_name AV_armnet1h+ --nfield 22 --nfeat 1600000 --dataset avazu --eval_freq 1000

python train.py --model armnet_1h --mlp_nlayer 2 --mlp_nhid 500 --h 128 --alpha 2.0 --lr 0.001 --exp_name CR_armnet1h --nfield 39 --nfeat 2100000 --dataset criteo
python train.py --model armnet_1h --mlp_nhid 500 --mlp_nlayer 2 --dnn_nlayer 2 --dnn_nhid 500 --ensemble --alpha 2.0 --h 128 --lr 0.003 --exp_name CR_armnet1h+ --nfield 39 --nfeat 2100000 --dataset criteo

python train.py --model armnet_1h --mlp_nlayer 1 --h 128 --alpha 1.7 --lr 0.003 --batch_size 1024 --exp_name DB_armnet1h --nfield 43 --nfeat 369 --dataset uci_diabetes
python train.py --model armnet_1h --mlp_nlayer 1 --dnn_nlayer 1 --ensemble --alpha 1.5 --h 128 --lr 0.01 --batch_size 1024 --exp_name DB_armnet1h+ --nfield 43 --nfeat 369 --dataset uci_diabetes

# Multi-chip examples (TPU pod slice): DP over 4 chips, tables row-sharded
# over 2 (mesh axes are logical; adjust to the slice size):
#   python train.py --model armnet_1h --dataset criteo --nfield 39 --nfeat 2100000 \
#       --mesh data:4,model:2 --shard_embedding --exp_name CR_armnet1h_sharded
