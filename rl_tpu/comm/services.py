"""Named-service registry.

Counterpart of ``/root/reference/torchrl/services/`` (``ServiceBase``
base.py:52, ``RayService`` ray_service.py:58): named singletons (tokenizers,
inference engines, replay services) shared across components.  In-process
registry here; remote services register a ``TCPTransport`` under the name.
"""
from __future__ import annotations

import threading
from typing import Any, Callable

__all__ = ["ServiceRegistry", "services"]


class ServiceRegistry:
    def __init__(self):
        self._services: dict[str, Any] = {}
        self._factories: dict[str, Callable[[], Any]] = {}
        self._lock = threading.Lock()

    def register(self, name: str, service: Any = None, *,
                 factory: Callable[[], Any] | None = None) -> None:
        with self._lock:
            if service is not None:
                self._services[name] = service
            elif factory is not None:
                self._factories[name] = factory
            else:
                raise ValueError("provide service or factory")

    def get(self, name: str) -> Any:
        with self._lock:
            if name in self._services:
                return self._services[name]
            if name in self._factories:
                self._services[name] = self._factories[name]()
                return self._services[name]
        raise KeyError(f"no service named {name!r}")

    def __contains__(self, name: str) -> bool:
        return name in self._services or name in self._factories

    def remove(self, name: str) -> None:
        with self._lock:
            self._services.pop(name, None)
            self._factories.pop(name, None)

    def list(self) -> list[str]:
        return sorted(set(self._services) | set(self._factories))


services = ServiceRegistry()
