from awq_tpu.eval.ppl import perplexity, load_text_tokens  # noqa: F401
from awq_tpu.eval.lm_eval_adaptor import LMEvalAdaptor  # noqa: F401
