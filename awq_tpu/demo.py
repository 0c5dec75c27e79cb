"""Interactive chat REPL.

Counterpart of ``tinychat/demo.py:82-283``: build/load model, warm up,
then loop — prompt template -> chunked prefill of the delta tokens on
reused history KV -> streamed decode with timing stats.

  python -m awq_tpu.demo --load_quant <ckpt> --model_path <hf_dir_for_tok>
  python -m awq_tpu.demo --model_path <hf_dir> --precision W16A16
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("awq_tpu.demo")
    p.add_argument("--model_path", type=str, default=None,
                   help="HF dir (weights for W16A16; tokenizer always)")
    p.add_argument("--load_quant", type=str, default=None,
                   help="packed quantized checkpoint prefix")
    p.add_argument("--precision", type=str, default="W4A16",
                   choices=["W4A16", "W3A16", "W16A16"])
    p.add_argument("--q_group_size", type=int, default=128)
    p.add_argument("--max_seq_len", type=int, default=2048)
    p.add_argument("--max_new_tokens", type=int, default=512)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--top_p", type=float, default=0.9)
    p.add_argument("--top_k", type=int, default=40)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--system", type=str, default=None)
    p.add_argument("--single_round", action="store_true",
                   help="drop history KV each round (no chunked prefill)")
    p.add_argument("--mesh", type=str, default=None,
                   help="'dp,tp' (or 'tp') device mesh: serve through the "
                        "sharded TP deploy layout (dp must be 1)")
    p.add_argument("--spec", action="store_true",
                   help="prompt-lookup speculative decoding (greedy; "
                        "device-side verify loop on TPU)")
    p.add_argument("--prefill_w8", action="store_true",
                   help="TTFT mode: int8 prefill weight cache (pure int8 "
                        "MXU prefill dots; ~1 extra HBM byte per weight)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    from transformers import AutoTokenizer

    from awq_tpu.config import GenConfig, QuantConfig, RuntimeConfig
    from awq_tpu.runtime.engine import InferenceEngine
    from awq_tpu.runtime.prompts import get_prompter, get_stop_token_ids

    if args.load_quant:
        from awq_tpu.utils.checkpoint import load_checkpoint

        params, cfg, _ = load_checkpoint(args.load_quant)
    elif args.model_path:
        from awq_tpu.models.hf_import import import_hf_model

        cfg, params = import_hf_model(args.model_path)
        if args.precision != "W16A16":
            from awq_tpu.models.llama import quantize_params

            w_bit = 4 if args.precision == "W4A16" else 3
            params = quantize_params(
                params, QuantConfig(w_bit=w_bit, group_size=args.q_group_size)
            )
    else:
        print("error: --model_path or --load_quant required", file=sys.stderr)
        return 2

    tok = AutoTokenizer.from_pretrained(
        args.model_path or args.load_quant, use_fast=True,
        trust_remote_code=True,
    )
    from awq_tpu.parallel import parse_mesh_arg

    # the engine fuses/tiles on construction (or builds the sharded TP
    # deploy layout when a mesh is given — multi-chip serving for models
    # that don't fit one chip)
    engine = InferenceEngine(
        cfg, params,
        RuntimeConfig(max_seq_len=args.max_seq_len,
                      mesh=parse_mesh_arg(args.mesh),
                      prefill_w8=args.prefill_w8),
        tokenizer=tok,
    )
    gen = GenConfig(
        temperature=args.temperature, top_p=args.top_p, top_k=args.top_k,
        max_new_tokens=args.max_new_tokens, greedy=args.greedy,
    )
    prompter = get_prompter(cfg.arch, args.model_path or "", args.system)
    stop_ids = get_stop_token_ids(args.model_path or cfg.arch, tok)

    print(f"[demo] {cfg.arch} ready on {jax.default_backend()} "
          f"({len(jax.devices())} device(s)). Ctrl-D or 'exit' to quit.")
    t0 = time.perf_counter()
    engine.warmup()
    print(f"[demo] warmup/compile {time.perf_counter() - t0:.1f}s")

    while True:
        try:
            user = input("USER: ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            break
        if user in ("exit", "quit"):
            break
        if not user:
            continue
        if args.single_round:
            engine.reset()
            prompter.reset()
        prompter.insert_prompt(user)
        ids = tok.encode(prompter.delta_prompt())
        if engine.start_pos > 0 and ids and ids[0] == tok.bos_token_id:
            ids = ids[1:]  # strip re-emitted BOS mid-dialogue (stream_gen.py:49-53)
        if args.spec:
            t0 = time.perf_counter()
            out = engine.generate_speculative(
                ids, args.max_new_tokens, stop_ids=stop_ids)
            dt = time.perf_counter() - t0
            text = out.get("text", "")
            prompter.update_template(text)
            st = out["stats"]
            n = max(len(out["output_ids"]), 1)
            print(f"ASSISTANT: {text}")
            print(f"  [{dt / n * 1e3:.2f} ms/tok wall | "
                  f"{n / max(st['steps'], 1):.2f} tokens/step | "
                  f"{st['accepted']}/{max(st['drafted'], 1)} drafts "
                  f"accepted]")
            continue
        out = engine.generate(ids, gen, stop_ids=stop_ids)
        text = out.get("text", "")
        prompter.update_template(text)
        t = out["timing"]
        print(f"ASSISTANT: {text}")
        print(f"  [TTFT {t['ttft_s'] * 1e3:.0f} ms | "
              f"{t['ms_per_token']:.2f} ms/tok | "
              f"{t['new_tokens']} tokens]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
