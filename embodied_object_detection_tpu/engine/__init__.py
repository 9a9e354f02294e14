from .eval import evaluate_dataset, EvalResults
