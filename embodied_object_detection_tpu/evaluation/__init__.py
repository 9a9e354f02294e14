from .coco_eval import COCOEvaluator, coco_ap
