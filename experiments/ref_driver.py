"""Run the TORCH REFERENCE (read-only at /root/reference) on CPU for the
quality-parity experiment.

This drives the reference's own modules — RqVae, SemanticIdTokenizer,
EncoderDecoderRetrievalModel, TopKAccumulator — end-to-end at matched
(CPU-feasible, reduced-iteration) hyperparameters on the same .npz artifacts
our framework trains on (experiments/make_synth_beauty.py), producing the
reference-side numbers for QUALITY.md. It is a test/benchmark harness, not
part of the framework.

Notes on the minimal shims required to run the reference outside its repo:
  * gin is not installed -> module stub (gin decorators are no-ops here).
  * data.processed imports torch_geometric (not installed) -> stubbed; the
    tokenizer only needs an indexable dataset, provided by _CorpusData.
  * --arch custom (DEFAULT, jagged_mode=True): runs the reference's REAL
    architecture — the custom pre-RMSNorm TransformerEncoderDecoder
    (/root/reference/modules/transformer/model.py:139-188). Two shims make
    the jagged path runnable on CPU without triton:
      (a) ops.triton.jagged is replaced with pure-torch equivalents:
          padded_to_jagged_tensor = boolean-mask gather + torch.nested.
          nested_tensor_from_jagged (differentiable: autograd flows through
          the gathered values exactly like the reference's custom Function
          backward, /root/reference/ops/triton/jagged.py:69-77);
          jagged_to_flattened_tensor = NestedTensor.values() (identical to
          the reference, jagged.py:88-89).
      (b) Attend.jagged_forward (/root/reference/modules/transformer/
          attention.py:113-124) is monkeypatched with a dense masked
          F.scaled_dot_product_attention of identical semantics: NJT ->
          padded buffer, key-padding mask from the offsets, per-sequence
          causal mask (sequences are left-aligned, so tril on the padded
          buffer is exact), outputs gathered back to jagged values. Padded
          query rows are computed-then-dropped; fully-masked rows are given
          a uniform dummy mask to keep the softmax finite (their outputs are
          discarded by the gather, and they receive zero upstream gradient).
    Everything else (RMSNorm, MLP, Linear, dropout, residual adds, the
    encoder-output cache, the model's own jagged loss branch at
    modules/model.py:256-261) runs unmodified on torch NestedTensors.
  * --arch nn (jagged_mode=False): the reference's fallback torch
    nn.Transformer (post-LayerNorm, biased projections, ReLU FFN —
    modules/model.py:87-95). NOTE this is a DIFFERENT architecture from the
    reference's GPU path; kept for the secondary comparison in QUALITY.md.
    Its non-jagged TRAINING branch crashes on an undefined `unred_loss`
    (modules/model.py:269 — only assigned in the jagged branch at :260), so
    the training loss is computed here from model._predict + out_proj with
    the exact semantics of model.py:263-266.
  * torch.compile is disabled (dynamo off) — semantics-neutral on CPU.

Usage:
  python experiments/ref_driver.py --root dataset/synth-beauty \
      --out out/ref --rqvae-iters 40000 --decoder-iters 10000
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)

import torch  # noqa: E402
import torch._dynamo  # noqa: E402

torch._dynamo.config.disable = True
torch.manual_seed(0)


def _padded_to_jagged_tensor(x, lengths, max_len):
    """Pure-torch replacement for the reference's triton-backed
    padded_to_jagged_tensor (/root/reference/ops/triton/jagged.py:80-85):
    differentiable boolean-mask gather into a torch.jagged NestedTensor."""
    assert x.dim() == 3 and max_len == x.shape[1]
    lengths = lengths.to(torch.int64)
    mask = (
        torch.arange(max_len, device=x.device).unsqueeze(0)
        < lengths.unsqueeze(1)
    )
    values = x[mask]
    offsets = torch.cat(
        [torch.zeros(1, dtype=torch.int64, device=x.device),
         lengths.cumsum(0)]
    )
    return torch.nested.nested_tensor_from_jagged(values, offsets)


def _jagged_to_flattened_tensor(nt):
    return nt.values()


def _njt_to_dense(nt):
    """NJT -> (dense padded (B, N, D), valid-mask (B, N)). Differentiable."""
    offsets = nt.offsets()
    lengths = offsets.diff()
    values = nt.values()
    B = lengths.numel()
    N = int(lengths.max())
    mask = (
        torch.arange(N, device=values.device).unsqueeze(0)
        < lengths.unsqueeze(1)
    )
    dense = values.new_zeros(B, N, values.shape[-1])
    dense[mask] = values
    return dense, mask


def _dense_jagged_forward(self, qu, ke, va, is_causal):
    """Monkeypatch for Attend.jagged_forward (/root/reference/modules/
    transformer/attention.py:113-124): identical attention semantics via a
    dense masked SDPA (flash SDPA over NJTs is CUDA-only)."""
    import torch.nn.functional as F  # noqa: PLC0415

    q, qm = _njt_to_dense(qu)
    k, km = _njt_to_dense(ke)
    v, _ = _njt_to_dense(va)
    B, Nq, _ = q.shape
    Nk = k.shape[1]
    h, dh = self.num_heads, self.head_dim
    q = q.view(B, Nq, h, dh).transpose(1, 2)
    k = k.view(B, Nk, h, dh).transpose(1, 2)
    v = v.view(B, Nk, h, dh).transpose(1, 2)
    mask = km[:, None, None, :]
    if is_causal:
        # left-aligned sequences: per-sequence causal == tril on the buffer
        mask = mask & torch.tril(
            torch.ones(Nq, Nk, dtype=torch.bool, device=q.device)
        )
    # keep softmax finite on fully-masked (padded-query) rows; their outputs
    # are dropped by the qm gather below and get zero upstream gradient
    mask = mask | ~mask.any(-1, keepdim=True)
    dropout_p = self.dropout if self.training and self.dropout else 0.0
    out = F.scaled_dot_product_attention(
        q, k, v, attn_mask=mask, dropout_p=dropout_p
    )
    out = out.transpose(1, 2).reshape(B, Nq, h * dh)
    return torch.nested.nested_tensor_from_jagged(out[qm], qu.offsets())


def install_stubs() -> None:
    if "gin" not in sys.modules:
        gin = types.ModuleType("gin")
        gin.constants_from_enum = lambda cls: cls
        gin.configurable = lambda fn=None, **kw: (
            fn if fn is not None else (lambda f: f)
        )
        sys.modules["gin"] = gin
    # replace the reference's triton-kernel module with the pure-torch
    # equivalents above (never fake `triton` itself: torch-inductor probes
    # `from triton import ...` and would trip on an incomplete fake)
    if "ops.triton.jagged" not in sys.modules:
        ops_pkg = types.ModuleType("ops")
        ops_tr = types.ModuleType("ops.triton")
        jag = types.ModuleType("ops.triton.jagged")
        jag.padded_to_jagged_tensor = _padded_to_jagged_tensor
        jag.jagged_to_flattened_tensor = _jagged_to_flattened_tensor
        ops_pkg.triton = ops_tr
        ops_tr.jagged = jag
        sys.modules["ops"] = ops_pkg
        sys.modules["ops.triton"] = ops_tr
        sys.modules["ops.triton.jagged"] = jag
    # data.processed pulls in torch_geometric (absent); the tokenizer only
    # needs the names for type annotations
    if "data.processed" not in sys.modules:
        import data  # the reference package (empty __init__)

        dp = types.ModuleType("data.processed")
        dp.ItemData = type("ItemData", (), {})
        dp.SeqData = type("SeqData", (), {})
        sys.modules["data.processed"] = dp
        data.processed = dp


sys.path.insert(0, REF)
install_stubs()

from data.schemas import SeqBatch  # noqa: E402  (reference, torch-only)
from modules.quantize import QuantizeForwardMode  # noqa: E402
from modules.rqvae import RqVae  # noqa: E402
from modules.tokenizer.semids import SemanticIdTokenizer  # noqa: E402
from modules.model import EncoderDecoderRetrievalModel  # noqa: E402
from modules.scheduler.inv_sqrt import InverseSquareRootScheduler  # noqa: E402
from evaluate.metrics import TopKAccumulator  # noqa: E402
from modules.transformer.attention import Attend  # noqa: E402

sys.path.remove(REF)

# CPU-runnable jagged attention of identical semantics (see module docstring)
Attend.jagged_forward = _dense_jagged_forward

from rqvae_tpu.data.dataset import load_item_dataset, load_seq_dataset  # noqa: E402


def _item_batch(x: np.ndarray) -> SeqBatch:
    t = torch.from_numpy(np.ascontiguousarray(x))
    n = t.shape[0]
    z = torch.zeros(n, 1, dtype=torch.long)
    return SeqBatch(user_ids=z[:, 0], ids=torch.arange(n).unsqueeze(1),
                    ids_fut=z, x=t, x_fut=t[:, :1], seq_mask=torch.ones(
                        n, 1, dtype=torch.bool))


class _CorpusData:
    """Indexable corpus for SemanticIdTokenizer.precompute_corpus_ids (the
    reference's DataLoader feeds dataset[batch_of_indices] -> SeqBatch)."""

    def __init__(self, x: np.ndarray):
        self.x = torch.from_numpy(np.ascontiguousarray(x))

    def __len__(self):
        return self.x.shape[0]

    def __getitem__(self, idx):
        ids = torch.as_tensor(idx, dtype=torch.long).reshape(-1, 1)
        x = self.x[ids[:, 0]]
        z = torch.zeros(len(ids), 1, dtype=torch.long)
        return SeqBatch(user_ids=z[:, 0], ids=ids, ids_fut=z, x=x,
                        x_fut=x[:, :1],
                        seq_mask=torch.ones(len(ids), 1, dtype=torch.bool))


def _seq_torch_batch(batch: dict, item_x: np.ndarray) -> SeqBatch:
    ids = torch.from_numpy(batch["ids"].astype(np.int64))
    ids_fut = torch.from_numpy(batch["ids_fut"].astype(np.int64))
    return SeqBatch(
        # (B, 1): the reference's SeqData yields a column vector and the
        # model cats the user token as a length-1 sequence (model.py:115)
        user_ids=torch.from_numpy(
            batch["user_ids"].astype(np.int64)
        ).reshape(-1, 1),
        ids=ids,
        ids_fut=ids_fut,
        x=torch.zeros(ids.shape[0], 1),
        x_fut=torch.zeros(ids.shape[0], 1),
        seq_mask=ids >= 0,
    )


def train_rqvae(args, items, log):
    train_x = items.x[items.is_train]
    eval_x = items.x[~items.is_train]
    model = RqVae(
        input_dim=768, embed_dim=args.vae_embed_dim,
        hidden_dims=[512, 256, 128],
        codebook_size=args.codebook_size, codebook_kmeans_init=True,
        codebook_normalize=False, codebook_sim_vq=False,
        codebook_mode=QuantizeForwardMode[args.rqvae_mode],
        n_layers=3, n_cat_features=0, commitment_weight=0.25,
    )
    opt = torch.optim.AdamW(model.parameters(), lr=args.rqvae_lr,
                            weight_decay=0.01)
    rng = np.random.default_rng(args.seed)
    t = 0.2
    model.train()
    # iter-0 lazy kmeans priming (reference train_rqvae.py:139-141)
    prime = train_x[: min(20000, len(train_x))]
    model(_item_batch(prime), t)

    t0 = time.monotonic()
    for it in range(args.rqvae_iters):
        idx = rng.integers(0, len(train_x), size=args.rqvae_bs)
        opt.zero_grad()
        out = model(_item_batch(train_x[idx]), gumbel_t=t)
        out.loss.backward()
        opt.step()
        if (it + 1) % 1000 == 0 or it == 0:
            log({"stage": "rqvae", "iter": it + 1,
                 "mode": args.rqvae_mode,
                 "total_loss": float(out.loss),
                 "reconstruction_loss": float(out.reconstruction_loss),
                 "rqvae_loss": float(out.rqvae_loss),
                 "p_unique_ids": float(out.p_unique_ids),
                 "it_per_s": (it + 1) / (time.monotonic() - t0)})
    # eval loss
    model.eval()
    with torch.no_grad():
        ev = model(_item_batch(eval_x[: 2048]), gumbel_t=t)
    log({"stage": "rqvae_eval", "eval_total_loss": float(ev.loss),
         "eval_reconstruction_loss": float(ev.reconstruction_loss)})
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "rqvae_ref.pt")
    torch.save({"iter": args.rqvae_iters - 1, "model": model.state_dict(),
                "model_config": model.config,
                "optimizer": opt.state_dict()}, path)
    return path


def _decoder_loss(model, tok):
    """Reference non-jagged training loss (modules/model.py:263-266), computed
    outside model.forward to dodge the `unred_loss` NameError at :269."""
    trnsf_out = model._predict(tok)
    logits = model.out_proj(trnsf_out)
    out = logits[:, :-1, :].flatten(end_dim=1)
    target = tok.sem_ids_fut.flatten(end_dim=1)
    unred = torch.nn.functional.cross_entropy(
        out, target, reduction="none", ignore_index=-1
    ).reshape(tok.sem_ids_fut.shape)
    return unred.sum(axis=1).mean(), unred.mean(axis=0)


def _ndcg_counts(actual: torch.Tensor, top_k: torch.Tensor, ks):
    """NDCG@k of the exact item (same formula as our evaluate/metrics.py:52-61:
    first full-tuple match at rank r contributes 1/log2(r+2))."""
    pos_match = (actual.unsqueeze(1) == top_k).all(axis=-1)  # (B, beams)
    found = pos_match.any(axis=-1)
    rank = pos_match.float().argmax(axis=-1)
    out = {}
    for k in ks:
        gain = torch.where(
            found & (rank < k), 1.0 / torch.log2(rank.float() + 2.0),
            torch.zeros(())
        )
        out[f"ndcg@{k}"] = float(gain.sum())
    return out


class _FastVerifier:
    """Drop-in for tokenizer.exists_prefix with identical semantics
    (set-membership of ID prefixes against the corpus table) but sorted-key
    lookups instead of the reference's O(n_items) equality scans per query —
    the scans make a 2048-user eval take hours on CPU. Quality numbers are
    unaffected; only eval wall-clock changes."""

    def __init__(self, cached_ids: torch.Tensor):
        self.d = cached_ids.shape[-1]
        self.base = int(max(int(cached_ids.max()) + 2, 2))
        self.tables = []
        ids = cached_ids.to(torch.int64)
        for l in range(1, self.d + 1):
            keys = torch.zeros(ids.shape[0], dtype=torch.int64)
            for i in range(l):
                keys = keys * self.base + ids[:, i]
            self.tables.append(torch.unique(keys))  # sorted

    def __call__(self, prefix: torch.Tensor) -> torch.Tensor:
        l = prefix.shape[-1]
        flat = prefix.reshape(-1, l).to(torch.int64)
        # out-of-range tokens can appear in sampled candidates; they are
        # never corpus members, and clamping keeps the packing collision-free
        oob = (flat < 0) | (flat >= self.base)
        keys = torch.zeros(flat.shape[0], dtype=torch.int64)
        for i in range(l):
            keys = keys * self.base + flat[:, i].clamp(0, self.base - 1)
        table = self.tables[l - 1]
        pos = torch.searchsorted(table, keys).clamp(max=len(table) - 1)
        ok = (table[pos] == keys) & ~oob.any(axis=-1)
        return ok.reshape(prefix.shape[:-1])


def train_decoder(args, items, seqs_train, seqs_eval, rq_path, log):
    tokenizer = SemanticIdTokenizer(
        input_dim=768, hidden_dims=[512, 256, 128],
        output_dim=args.vae_embed_dim,
        codebook_size=args.codebook_size, n_layers=3, n_cat_feats=0,
        rqvae_weights_path=rq_path,
    )
    tokenizer.precompute_corpus_ids(_CorpusData(items.x))
    max_dup = int(tokenizer.cached_ids[:, -1].max())
    log({"stage": "tokenizer", "max_id_duplicates": max_dup,
         "n_items": len(items.x)})
    if max_dup >= args.codebook_size:
        if not args.clamp_dedup:
            raise SystemExit(
                f"dedup rank {max_dup} >= codebook size {args.codebook_size} "
                "(undertrained RQ-VAE overflows the sem-ID embedding; rerun "
                "stage 1 longer, or pass --clamp-dedup for smoke tests)"
            )
        tokenizer.cached_ids[:, -1].clamp_(max=args.codebook_size - 1)

    model = EncoderDecoderRetrievalModel(
        embedding_dim=args.decoder_embed_dim,
        attn_dim=args.attn_dim, dropout=args.dropout, num_heads=args.attn_heads,
        n_layers=args.attn_layers, num_embeddings=args.codebook_size,
        sem_id_dim=tokenizer.sem_ids_dim,
        inference_verifier_fn=_FastVerifier(tokenizer.cached_ids),
        max_pos=seqs_train.max_seq_len * tokenizer.sem_ids_dim,
        jagged_mode=args.arch == "custom",
    )
    opt = torch.optim.AdamW(model.parameters(), lr=3e-4, weight_decay=0.035)
    sched = InverseSquareRootScheduler(optimizer=opt, warmup_steps=10000)
    rng = np.random.default_rng(args.seed + 1)
    t0 = time.monotonic()
    for it in range(args.decoder_iters):
        model.train()
        raw = seqs_train.sample_batch(rng, args.decoder_bs, subsample=True)
        tok = tokenizer(_seq_torch_batch(raw, items.x))
        opt.zero_grad()
        if args.arch == "custom":
            # the reference's own jagged loss branch (modules/model.py:256-261)
            out = model(tok)
            loss, loss_d = out.loss, out.loss_d
        else:
            loss, loss_d = _decoder_loss(model, tok)
        loss.backward()
        opt.step()
        sched.step()
        if (it + 1) % 200 == 0 or it == 0:
            log({"stage": "decoder", "iter": it + 1, "arch": args.arch,
                 "total_loss": float(loss.detach()),
                 **{f"loss_{d}": float(loss_d[d].detach())
                    for d in range(len(loss_d))},
                 "it_per_s": (it + 1) / (time.monotonic() - t0)})
        if (it + 1) % args.full_eval_every == 0 or it + 1 == args.decoder_iters:
            evaluate_decoder(args, model, tokenizer, items, seqs_eval, log,
                             it + 1)
    path = os.path.join(args.out, "decoder_ref.pt")
    torch.save({"iter": args.decoder_iters - 1, "model": model.state_dict(),
                "optimizer": opt.state_dict()}, path)
    return path


def evaluate_decoder(args, model, tokenizer, items, seqs_eval, log, it):
    n_eval = min(args.eval_users, len(seqs_eval))
    if n_eval == 0:
        return {}
    model.eval()
    model.enable_generation = True
    acc = TopKAccumulator(ks=[1, 5, 10])
    ndcg = {f"ndcg@{k}": 0.0 for k in (1, 5, 10)}
    t0 = time.monotonic()
    for lo in range(0, n_eval, args.decoder_bs):
        idx = np.arange(lo, min(lo + args.decoder_bs, n_eval))
        tok = tokenizer(_seq_torch_batch(seqs_eval.batch_at(idx), items.x))
        with torch.no_grad():
            gen = model.generate_next_sem_id(tok, top_k=True, temperature=1)
        actual, top_k = tok.sem_ids_fut, gen.sem_ids
        acc.accumulate(actual=actual, top_k=top_k)
        for k, v in _ndcg_counts(actual, top_k, (1, 5, 10)).items():
            ndcg[k] += v
    model.enable_generation = False
    metrics = acc.reduce()
    metrics.update({k: v / acc.total for k, v in ndcg.items()})
    log({"stage": "decoder_full_eval", "iter": it, "arch": args.arch,
         "seed": args.seed, "n_eval": acc.total,
         "eval_s": time.monotonic() - t0, **metrics})
    return metrics


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="dataset/synth-beauty")
    p.add_argument("--split", default="beauty")
    p.add_argument("--out", default="out/ref")
    p.add_argument("--stage", default="all",
                   choices=["rqvae", "decoder", "all", "eval"])
    p.add_argument("--decoder-path", default=None,
                   help="saved decoder_ref.pt for --stage eval")
    p.add_argument("--eval-split", default="eval", choices=["eval", "test"])
    p.add_argument("--arch", default="custom", choices=["custom", "nn"],
                   help="decoder architecture: 'custom' = the reference's "
                        "real pre-RMSNorm TransformerEncoderDecoder "
                        "(jagged_mode=True, DEFAULT); 'nn' = its torch "
                        "nn.Transformer fallback (jagged_mode=False)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--codebook-size", type=int, default=256)
    p.add_argument("--max-seq-len", type=int, default=20,
                   help="history length in items (20 beauty, 200 ml32m)")
    p.add_argument("--vae-embed-dim", type=int, default=32)
    p.add_argument("--rqvae-lr", type=float, default=5e-4)
    p.add_argument("--rqvae-mode", default="ROTATION_TRICK",
                   choices=["ROTATION_TRICK", "GUMBEL_SOFTMAX", "STE"],
                   help="stage-1 estimator (reference default is gumbel, "
                        "train_rqvae.py:47; the shipped gin configs use "
                        "rotation)")
    p.add_argument("--attn-heads", type=int, default=8)
    p.add_argument("--dropout", type=float, default=0.3)
    p.add_argument("--rqvae-iters", type=int, default=40000)
    p.add_argument("--rqvae-bs", type=int, default=64)
    p.add_argument("--decoder-iters", type=int, default=10000)
    p.add_argument("--decoder-bs", type=int, default=64)
    p.add_argument("--decoder-embed-dim", type=int, default=64)
    p.add_argument("--attn-dim", type=int, default=128)
    p.add_argument("--attn-layers", type=int, default=4)
    p.add_argument("--full-eval-every", type=int, default=1000000)
    p.add_argument("--eval-users", type=int, default=2048)
    p.add_argument("--rqvae-path", default=None)
    p.add_argument("--clamp-dedup", action="store_true",
                   help="clamp dedup ranks into the embedding range "
                        "(smoke tests with an undertrained RQ-VAE only)")
    args = p.parse_args(argv)

    # module-level manual_seed(0) kept for back-compat with the round-2 runs;
    # reseed from --seed so seed-variance runs vary torch init/dropout too
    torch.manual_seed(args.seed)

    os.makedirs(args.out, exist_ok=True)
    logf = open(os.path.join(args.out, "metrics.jsonl"), "a")

    def log(rec):
        rec = {"t": round(time.time(), 1), **rec}
        print(json.dumps(rec), flush=True)
        logf.write(json.dumps(rec) + "\n")
        logf.flush()

    # amazon artifacts live in processed_<split>; movielens in processed/
    sub = f"processed_{args.split}" if args.split else "processed"
    d = os.path.join(args.root, sub)
    items = load_item_dataset(os.path.join(d, "items.npz"))
    # the reference truncates item features to the 768-dim text embedding in
    # ItemData.__getitem__ (reference data/processed.py:76,153), silently
    # dropping movielens genre one-hots; replicate for identical inputs
    items.x = items.x[:, :768]
    seqs_train = load_seq_dataset(
        os.path.join(d, "seqs_train.npz"), args.max_seq_len
    )
    seqs_eval = load_seq_dataset(
        os.path.join(d, f"seqs_{args.eval_split}.npz"), args.max_seq_len
    )

    rq_path = args.rqvae_path or os.path.join(args.out, "rqvae_ref.pt")
    if args.stage in ("rqvae", "all"):
        rq_path = train_rqvae(args, items, log)
    if args.stage in ("decoder", "all"):
        train_decoder(args, items, seqs_train, seqs_eval, rq_path, log)
    if args.stage == "eval":
        # eval-only: rebuild tokenizer + model, load the saved decoder
        tokenizer = SemanticIdTokenizer(
            input_dim=768, hidden_dims=[512, 256, 128],
            output_dim=args.vae_embed_dim,
            codebook_size=args.codebook_size, n_layers=3, n_cat_feats=0,
            rqvae_weights_path=rq_path,
        )
        tokenizer.precompute_corpus_ids(_CorpusData(items.x))
        model = EncoderDecoderRetrievalModel(
            embedding_dim=args.decoder_embed_dim,
            attn_dim=args.attn_dim, dropout=args.dropout, num_heads=args.attn_heads,
            n_layers=args.attn_layers, num_embeddings=args.codebook_size,
            sem_id_dim=tokenizer.sem_ids_dim,
            inference_verifier_fn=_FastVerifier(tokenizer.cached_ids),
            max_pos=seqs_train.max_seq_len * tokenizer.sem_ids_dim,
            jagged_mode=args.arch == "custom",
        )
        dec = args.decoder_path or os.path.join(args.out, "decoder_ref.pt")
        model.load_state_dict(torch.load(dec, weights_only=False)["model"])
        log({"stage": "eval_only", "split": args.eval_split,
             "decoder": dec})
        evaluate_decoder(args, model, tokenizer, items, seqs_eval, log, -1)


if __name__ == "__main__":
    main()
