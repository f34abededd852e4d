"""Financial trading env: GBM prices, hold/buy/sell with transaction costs.

Counterpart of ``/root/reference/torchrl/envs/custom/trading.py``
(``FinancialRegimeEnv`` :28).  Dynamics: geometric Brownian motion price
path (daily dt = 1/252); actions 0=Hold 1=Buy 2=Sell; Buy opens a position
paying a transaction cost, Sell realizes (exit−entry)/entry P&L minus cost,
holding earns 0.1× the unrealized step return as shaping.  All branching is
``where``-selects — jittable and batchable via vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_tpu.data import Binary, Categorical, Composite, TDict, Unbounded
from ..base import Env

__all__ = ["FinancialRegimeEnv"]


class FinancialRegimeEnv(Env):
    def __init__(self, *, window_size: int = 50, initial_price: float = 100.0,
                 volatility: float = 0.2, drift: float = 0.05,
                 transaction_cost: float = 0.001, max_steps: int = 252):
        self.window_size = int(window_size)
        self.initial_price = float(initial_price)
        self.volatility = float(volatility)
        self.drift = float(drift)
        self.transaction_cost = float(transaction_cost)
        self.max_steps = int(max_steps)

    @property
    def observation_spec(self) -> Composite:
        return Composite(
            price_history=Unbounded((self.window_size,)),
            current_holdings=Binary(shape=(1,)),
            entry_price=Unbounded((1,)),
            step_count=Unbounded((1,), jnp.int32),
        )

    def _action_spec(self):
        return Categorical(3, (), jnp.int32)  # Hold / Buy / Sell

    def _obs(self, state) -> TDict:
        return TDict(
            price_history=state["price_history"],
            current_holdings=state["current_holdings"],
            entry_price=state["entry_price"],
            step_count=state["step_count"],
        )

    def _reset(self, key):
        # warm up the window with a GBM path from the initial price
        dt = 1.0 / 252.0
        shocks = (
            self.volatility * jnp.sqrt(dt)
            * jax.random.normal(key, (self.window_size - 1,))
            + self.drift * dt
        )
        log_prices = jnp.concatenate(
            [jnp.zeros((1,)), jnp.cumsum(shocks)]
        )
        history = self.initial_price * jnp.exp(log_prices)
        state = TDict(
            price_history=history.astype(jnp.float32),
            current_holdings=jnp.zeros((1,), bool),
            entry_price=jnp.zeros((1,), jnp.float32),
            step_count=jnp.zeros((1,), jnp.int32),
        )
        return state, self._obs(state)

    def _step(self, state, td, key):
        dt = 1.0 / 252.0
        history = state["price_history"]
        holding = state["current_holdings"][0]
        entry = state["entry_price"][0]
        action = jnp.asarray(td["action"], jnp.int32).reshape(())

        price = history[-1]
        shock = self.volatility * jnp.sqrt(dt) * jax.random.normal(key, ())
        next_price = price * jnp.exp(self.drift * dt + shock)
        new_history = jnp.concatenate([history[1:], next_price[None]])

        buy = (action == 1) & ~holding
        sell = (action == 2) & holding
        reward = jnp.where(buy, -self.transaction_cost * price, 0.0)
        safe_entry = jnp.maximum(entry, 1e-6)
        reward = reward + jnp.where(
            sell,
            (price - safe_entry) / safe_entry - self.transaction_cost * price,
            0.0,
        )
        new_holding = jnp.where(buy, True, jnp.where(sell, False, holding))
        new_entry = jnp.where(buy, price, jnp.where(sell, 0.0, entry))
        # shaping: 0.1 × unrealized step return while holding
        reward = reward + jnp.where(
            new_holding, 0.1 * (next_price - price) / price, 0.0
        )

        t = state["step_count"] + 1
        truncated = t >= self.max_steps
        new_state = TDict(
            price_history=new_history.astype(jnp.float32),
            current_holdings=new_holding.reshape(1),
            entry_price=new_entry.reshape(1).astype(jnp.float32),
            step_count=t,
        )
        return new_state, self._obs(new_state).update(TDict(
            reward=reward.reshape(1).astype(jnp.float32),
            terminated=jnp.zeros((1,), bool),
            truncated=truncated.reshape(1),
        ))


# The reference names this concept ``TradingEnv``
# (/root/reference/torchrl/envs/custom/trading.py); FinancialRegimeEnv is the
# TPU-native regime-switching variant — alias for API parity.
TradingEnv = FinancialRegimeEnv
__all__.append("TradingEnv")
