from .predictor import EmbodiedPredictor, get_clip_embeddings, build_zs_weight
