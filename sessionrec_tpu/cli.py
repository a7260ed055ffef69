"""Unified CLI — replaces the reference's per-model scripts + start.sh.

    python -m sessionrec_tpu.cli train --model msgifsr --dataset-dir datasets/sample --order 1
    python -m sessionrec_tpu.cli preprocess --dataset diginetica --input train-item-views.csv --output-dir datasets/diginetica

Flag surface and defaults reproduce the reference scripts
(main_lessr.py / main_niser.py / main_msgifsr.py; see utils/config.py).
All four models are runnable (the reference's dispatcher references a
missing main_srgnn.py, start.sh:6).
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_train_flags(p):
    p.add_argument("--model", required=True,
                   choices=["srgnn", "niser", "lessr", "msgifsr"])
    p.add_argument("--dataset-dir", default="datasets/sample")
    p.add_argument("--embedding-dim", type=int, default=None)
    p.add_argument("--num-layers", type=int, default=None)
    p.add_argument("--feat-drop", type=float, default=None)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--patience", type=int, default=None)
    p.add_argument("--valid-split", type=float, default=None)
    p.add_argument("--max-len", type=int, default=None,
                   help="static per-example node cap; prefixes longer than "
                        "this keep their most recent max-len items "
                        "(default: longest session in the data)")
    p.add_argument("--split-len", type=str, default=None,
                   help="length-bucketed batches: comma-separated "
                        "ascending length thresholds; each adds a tier "
                        "compiled at its own smaller node cap (same "
                        "example set per step; metric identity tested). "
                        "Default '4,8' (measured sweet spot on real "
                        "length distributions: 1.8-2.3x vs unsplit, "
                        "+4-16%% vs the single-8 split); a single int "
                        "gives two tiers; 0 disables")
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--order", type=int, default=None, help="MSGIFSR order")
    p.add_argument("--reducer", default=None, choices=["mean", "max", "concat"])
    p.add_argument("--no-norm", action="store_true")
    p.add_argument("--extra", action="store_true", help="MSGIFSR REnorm")
    p.add_argument("--fusion", action="store_true", help="MSGIFSR IFR")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--shuffle", action="store_true", default=None)
    p.add_argument("--no-shuffle", dest="shuffle", action="store_false")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--data-parallel", type=int, default=1)
    p.add_argument("--model-parallel", type=int, default=1,
                   help="catalog-shard factor; on multi-chip runs prefer "
                        ">=2 — a dp-only mesh pays ~2x the embedding-"
                        "gradient wire (BENCH_NOTES.md r4)")
    # multi-host: launch one process per host with the same coordinator
    # (parallel/multihost.py); device counts are global across processes
    p.add_argument("--coordinator", default=None,
                   help="jax.distributed coordinator address host:port")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--unroll", type=int, default=8,
                   help="device-side train steps per dispatch (lax.scan)")
    p.add_argument("--compute-dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--table-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="embedding-table storage dtype; bfloat16 halves "
                        "table+moment HBM traffic (stochastic-rounded "
                        "updates)")
    p.add_argument("--max-epoch-batches", type=int, default=None,
                   help="cap batches per epoch (smoke runs)")
    p.add_argument("--metrics-file", default=None,
                   help="append structured train/eval metrics as JSONL")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the run here")


def build_config(args):
    from sessionrec_tpu.utils.config import preset
    cfg = preset(args.model)
    m, d, t = cfg.model, cfg.data, cfg.train
    if args.embedding_dim is not None:
        m.embedding_dim = args.embedding_dim
    if args.num_layers is not None:
        m.num_layers = args.num_layers
    if args.feat_drop is not None:
        m.feat_drop = args.feat_drop
    if args.order is not None:
        m.order = args.order
    if args.reducer is not None:
        m.reducer = args.reducer
    if args.no_norm:
        m.norm = False
    m.extra = args.extra
    m.fusion = args.fusion
    m.compute_dtype = args.compute_dtype
    m.table_dtype = args.table_dtype
    d.dataset_dir = args.dataset_dir
    if args.batch_size is not None:
        d.batch_size = args.batch_size
    if args.shuffle is not None:
        d.shuffle_train = args.shuffle
    d.valid_split = args.valid_split
    if args.max_len is not None:
        d.max_len = args.max_len
    if args.split_len is not None:
        ts = tuple(int(t) for t in str(args.split_len).split(",")
                   if t.strip())
        ts = tuple(t for t in ts if t > 0)
        d.split_len = (ts if len(ts) > 1 else (ts[0] if ts else None))
    t.lr = args.lr
    t.epochs = args.epochs
    t.weight_decay = args.weight_decay
    if args.patience is not None:
        t.patience = args.patience
    t.log_interval = args.log_interval
    t.seed = args.seed
    t.checkpoint_dir = args.checkpoint_dir
    t.resume = args.resume
    t.data_parallel = args.data_parallel
    t.model_parallel = args.model_parallel
    t.unroll = args.unroll
    t.metrics_file = args.metrics_file
    t.profile_dir = args.profile_dir
    return cfg


def cmd_train(args):
    if args.coordinator is not None or args.num_processes is not None:
        from sessionrec_tpu.parallel.multihost import initialize
        initialize(args.coordinator, args.num_processes, args.process_id)
    from sessionrec_tpu.train.session import run_training
    cfg = build_config(args)
    mrr, hit = run_training(cfg, max_epoch_batches=args.max_epoch_batches)
    print("MRR@20\tHR@20")
    print(f"{mrr * 100:.3f}%\t{hit * 100:.3f}%")


def cmd_preprocess(args):
    from sessionrec_tpu.data import preprocess as pp
    pp.run(args.dataset, args.input, args.output_dir)


def cmd_predict(args):
    """Serve top-k recommendations from a checkpoint (serving.py — a
    capability the reference lacks; it never persists or serves a
    model)."""
    from sessionrec_tpu.data.io import max_session_len, read_dataset, \
        read_sessions
    from sessionrec_tpu.models import build_model
    from sessionrec_tpu import serving

    if not args.checkpoint_dir:
        sys.exit("predict requires --checkpoint-dir (a directory written "
                 "by train --checkpoint-dir)")
    cfg = build_config(args)
    train_sessions, test_sessions, num_items = read_dataset(
        args.dataset_dir)
    sessions = (read_sessions(args.sessions_file) if args.sessions_file
                else test_sessions)
    max_len = cfg.data.max_len or max(max_session_len(train_sessions),
                                      max_session_len(test_sessions))
    model = build_model(cfg.model, num_items)
    params, state = serving.restore_params(model, args.checkpoint_dir)
    out = open(args.output, "w") if args.output else sys.stdout
    try:
        for sess, ids, scores in serving.recommend(
                model, params, state, sessions, max_len=max_len,
                k=args.k, batch_size=cfg.data.batch_size,
                method=args.topk_method, recall_target=args.recall_target,
                order=cfg.model.order):
            out.write(json.dumps({"session": sess, "items": ids,
                                  "scores": [round(s, 4) for s in scores]})
                      + "\n")
    finally:
        if out is not sys.stdout:
            out.close()


def main(argv=None):
    parser = argparse.ArgumentParser(prog="sessionrec_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    pt = sub.add_parser("train", help="train a model")
    _add_train_flags(pt)
    pp = sub.add_parser("preprocess", help="offline dataset preprocessing")
    pp.add_argument("--dataset", required=True,
                    choices=["diginetica", "gowalla", "lastfm", "yoochoose",
                             "yoochoose_stage1"])
    pp.add_argument("--input", required=True,
                    help="raw csv/dat file (or dir for yoochoose stage 2)")
    pp.add_argument("--output-dir", required=True)
    pr = sub.add_parser(
        "predict", help="serve top-k recommendations from a checkpoint")
    _add_train_flags(pr)   # model geometry + --dataset-dir + --checkpoint-dir
    pr.add_argument("--sessions-file", default=None,
                    help="sessions to score, one comma-joined id list per "
                         "line (default: the dataset's test split)")
    pr.add_argument("--k", type=int, default=20)
    pr.add_argument("--output", default=None,
                    help="JSONL output path (default: stdout)")
    pr.add_argument("--topk-method", default="exact",
                    choices=["exact", "approx"],
                    help="approx = TPU lax.approx_max_k; bounded-recall, "
                         "much faster on million-item catalogs "
                         "(BENCH_NOTES.md)")
    pr.add_argument("--recall-target", type=float, default=0.95)
    args = parser.parse_args(argv)
    if args.cmd == "train":
        cmd_train(args)
    elif args.cmd == "preprocess":
        cmd_preprocess(args)
    elif args.cmd == "predict":
        cmd_predict(args)


if __name__ == "__main__":
    main()
