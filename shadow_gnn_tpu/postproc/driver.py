"""Postprocessing driver (C&S / subgraph-ensemble). See cns.py / ens.py."""


def run_postproc(args):
    from shadow_gnn_tpu.postproc.cns import run_correct_smooth
    return run_correct_smooth(args)
