"""Scoring CLI — alias of ``mraudio_tpu.eval.mr_eval:eval_main``."""

from mraudio_tpu.eval.mr_eval import eval_main

if __name__ == "__main__":
    eval_main()
