from .grpo import (
    GRPOLoss,
    DAPO,
    CISPOLoss,
    MCAdvantage,
    SFTLoss,
    dpo_loss,
    grpo_loss,
    mc_advantage,
    preference_loss,
    sft_loss,
)

__all__ = [
    "GRPOLoss",
    "DAPO",
    "CISPOLoss",
    "MCAdvantage",
    "SFTLoss",
    "dpo_loss",
    "grpo_loss",
    "mc_advantage",
    "preference_loss",
    "sft_loss",
]
