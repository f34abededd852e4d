from .grpo import (
    GRPOLoss,
    DAPO,
    CISPOLoss,
    MCAdvantage,
    SFTLoss,
    grpo_loss,
    mc_advantage,
    sft_loss,
)

__all__ = [
    "GRPOLoss",
    "DAPO",
    "CISPOLoss",
    "MCAdvantage",
    "SFTLoss",
    "grpo_loss",
    "mc_advantage",
    "sft_loss",
]
