from .iou import retrieval_eval, segment_iou, evaluate_predictions  # noqa: F401
