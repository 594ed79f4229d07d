from vlp_tpu.models.registry import create_backbone, BACKBONE_FEATURE_DIMS  # noqa: F401
