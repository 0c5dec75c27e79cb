"""CLI driver: AWQ search -> quantize -> dump -> evaluate.

Counterpart of ``awq/entry.py`` (flags at ``awq/entry.py:26-96``, pipeline
at ``:122-353``), rebuilt for the functional JAX stack:

  python -m awq_tpu.entry --model_path <hf_dir> --w_bit 4 --q_group_size 128 \
      --run_awq --dump_awq awq.pkl
  python -m awq_tpu.entry --model_path <hf_dir> --load_awq awq.pkl \
      --q_backend real --dump_quant model-w4-g128
  python -m awq_tpu.entry --load_quant model-w4-g128 --tasks wikitext

No accelerate device maps: multi-chip placement is a mesh flag
(``--mesh dp,tp``) and NamedShardings (awq_tpu.parallel).
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("awq_tpu.entry")
    p.add_argument("--model_path", type=str, help="HF checkpoint dir")
    p.add_argument("--dtype", type=str, default="bfloat16")
    # quant config (awq/entry.py:107-117)
    p.add_argument("--w_bit", type=int, default=4)
    p.add_argument("--q_group_size", type=int, default=128)
    p.add_argument("--no_zero_point", action="store_true")
    # awq search / apply (awq/entry.py:60-75)
    p.add_argument("--run_awq", action="store_true")
    p.add_argument("--dump_awq", type=str, default=None)
    p.add_argument("--load_awq", type=str, default=None)
    p.add_argument("--no_auto_scale", action="store_true")
    p.add_argument("--no_mse_range", action="store_true")
    p.add_argument("--calib_data", type=str, default="pileval")
    p.add_argument("--n_samples", type=int, default=128)
    p.add_argument("--calib_block_size", type=int, default=512)
    # quant backend (awq/entry.py:76-84)
    p.add_argument("--q_backend", type=str, default="real",
                   choices=["fake", "real"])
    p.add_argument("--dump_quant", type=str, default=None)
    p.add_argument("--load_quant", type=str, default=None)
    # eval (awq/entry.py:40-56)
    p.add_argument("--tasks", type=str, default=None,
                   help="'wikitext' or comma-separated lm-eval tasks")
    p.add_argument("--eval_corpus", type=str, default="wikitext2",
                   help="'wikitext2' (HF hub) or a local .txt file for the "
                        "ppl task (air-gapped machines)")
    p.add_argument("--eval_seqlen", type=int, default=2048)
    p.add_argument("--eval_windows", type=int, default=None)
    # placement
    p.add_argument("--mesh", type=str, default=None,
                   help="'dp,tp' mesh shape; default auto")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from awq_tpu.config import QuantConfig
    from awq_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    qcfg = QuantConfig(
        w_bit=args.w_bit,
        group_size=args.q_group_size,
        zero_point=not args.no_zero_point,
    )

    tokenizer = None

    def get_tokenizer():
        nonlocal tokenizer
        if tokenizer is None and args.model_path:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(
                args.model_path, use_fast=True, trust_remote_code=True
            )
        return tokenizer

    # ---- build or load the model -----------------------------------------
    if args.load_quant:
        params, cfg, qcfg_loaded = load_checkpoint(args.load_quant)
        if qcfg_loaded is not None:
            qcfg = qcfg_loaded
        print(f"[entry] loaded quantized checkpoint {args.load_quant} "
              f"(w{qcfg.w_bit} g{qcfg.group_size})")
    else:
        if not args.model_path:
            print("error: --model_path or --load_quant required",
                  file=sys.stderr)
            return 2
        from awq_tpu.models.hf_import import import_hf_model

        cfg, params = import_hf_model(args.model_path, dtype=args.dtype)
        print(f"[entry] imported {args.model_path}: {cfg.arch} "
              f"L={cfg.num_layers} H={cfg.hidden_size}")

        if args.run_awq:
            from awq_tpu.quant.awq import run_awq
            from awq_tpu.utils.calib import get_calib_dataset

            samples = get_calib_dataset(
                args.calib_data,
                None if args.calib_data == "synthetic" else get_tokenizer(),
                n_samples=args.n_samples,
                block_size=args.calib_block_size,
                vocab_size=cfg.vocab_size,
            )
            params, result = run_awq(
                params, cfg, jnp.asarray(samples), qcfg,
                auto_scale=not args.no_auto_scale,
                mse_range=not args.no_mse_range,
                verbose=True,
            )
            if args.dump_awq:
                result.save(args.dump_awq)
                print(f"[entry] dumped AWQ results to {args.dump_awq}")
                if not (args.tasks or args.dump_quant):
                    return 0
            awq_result = result
        elif args.load_awq:
            from awq_tpu.quant.awq import AwqResult, apply_awq

            awq_result = AwqResult.load(args.load_awq)
            params = apply_awq(params, cfg, awq_result)
            print(f"[entry] applied AWQ results from {args.load_awq}")
        else:
            awq_result = None

        if args.q_backend == "real" and (args.dump_quant or args.load_awq
                                         or args.run_awq):
            from awq_tpu.models.llama import quantize_params
            from awq_tpu.quant.awq import clips_by_layer

            clips = (clips_by_layer(awq_result, cfg)
                     if awq_result is not None else None)
            params = quantize_params(params, qcfg, clips=clips)
            print(f"[entry] real-quantized to packed w{qcfg.w_bit} "
                  f"g{qcfg.group_size}")
        elif args.q_backend == "fake" and awq_result is not None:
            from awq_tpu.models.llama import pseudo_quantize_params
            from awq_tpu.quant.awq import clips_by_layer

            # apply the searched clips too (reference clamps weights before
            # the fake-quant eval, auto_clip.py:87-98); without them the
            # fake backend under-reports accuracy vs the real backend
            clips = clips_by_layer(awq_result, cfg)
            params = pseudo_quantize_params(params, qcfg, clips=clips)
            print("[entry] pseudo-quantized (fake backend, clips applied)")

        if args.dump_quant:
            save_checkpoint(args.dump_quant, params, cfg, qcfg)
            print(f"[entry] saved quantized checkpoint to {args.dump_quant}")

    # ---- placement ---------------------------------------------------------
    # Counterpart of the reference's accelerate dispatch for >1-GPU eval
    # (awq/entry.py:166-186): shard params over a (dp, tp) mesh so models
    # bigger than one chip are evaluable. GSPMD inserts the collectives.
    if args.mesh:
        from awq_tpu.parallel import MeshConfig, make_mesh, shard_params

        try:
            dp, tp = (int(x) for x in args.mesh.split(","))
        except ValueError:
            print(f"error: --mesh expects 'dp,tp', got {args.mesh!r}",
                  file=sys.stderr)
            return 2
        mesh = make_mesh(MeshConfig(dp=dp, tp=tp))
        params = shard_params(params, mesh)
        print(f"[entry] sharded params over mesh dp={dp} tp={tp} "
              f"({dp * tp} devices)")

    # ---- evaluation -------------------------------------------------------
    if args.tasks:
        tok = get_tokenizer()
        if tok is None:
            print("error: --tasks needs --model_path for the tokenizer",
                  file=sys.stderr)
            return 2
        task_list = [t for t in args.tasks.split(",") if t]
        if "wikitext" in task_list:
            from awq_tpu.eval import load_text_tokens, perplexity

            ids = load_text_tokens(args.eval_corpus, tok)
            ppl = perplexity(
                params, cfg, ids, seqlen=args.eval_seqlen,
                max_windows=args.eval_windows, verbose=True,
            )
            print(f"[entry] wikitext-2 ppl = {ppl:.4f}")
            task_list.remove("wikitext")
        if task_list:
            from awq_tpu.eval import LMEvalAdaptor
            from awq_tpu.eval.lm_eval_adaptor import evaluate_tasks

            lm = LMEvalAdaptor(params, cfg, tok, max_length=args.eval_seqlen)
            results = evaluate_tasks(lm, task_list)
            print(results["results"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
