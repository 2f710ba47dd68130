from .dual_softmax import fused_match_scores, extract_matches_fused  # noqa: F401
