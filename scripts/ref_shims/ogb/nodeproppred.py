class Evaluator:
    def __init__(self, name=None, *a, **kw):
        raise RuntimeError(
            "ogb is not installed in this environment; the reference A/B "
            "harness only supports non-ogb metrics (accuracy/f1)")


class DglNodePropPredDataset(Evaluator):
    pass


class PygNodePropPredDataset(Evaluator):
    pass
