"""Model zoo: PointPillars family, BEVFusion, RCFusion, BEVFormer, MTL."""
