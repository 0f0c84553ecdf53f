"""Evaluation suite: detection (mAP/TP-errors/NOS), occupancy IoU, tracking."""
