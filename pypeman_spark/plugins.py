"""Plugin system (reference ``pypeman/plugins/base.py`` +
``pypeman/plugin_mgr.py``).

Plugins are sidecar components living next to the channel graph
(monitoring, admin transports, debug hooks). The lifecycle state machine
is the reference's: INITIALIZED → READY → STARTING → STARTED → STOPPING
→ STOPPED → DESTROYED, with the same assertion discipline.

``PluginManager.import_plugins`` resolves dotted ``module.Class`` names
(the reference reads them from ``settings.PLUGINS``); the CLI's
``start`` command drives the full lifecycle around channel startup.

:class:`RemoteAdminPlugin` packages the REST + websocket admin servers
as a plugin, mirroring ``pypeman/plugins/remoteadmin/plugin.py``.
"""

from __future__ import annotations

import logging
from importlib import import_module

logger = logging.getLogger(__name__)

__all__ = ["BasePlugin", "PluginManager", "RemoteAdminPlugin"]


class BasePlugin:
    """Lifecycle base (``plugins/base.py:15-120``)."""

    (INITIALIZED, READY, STARTING, STARTED, STOPPING, STOPPED, DESTROYED) = range(7)
    STATE_NAMES = (
        "INITIALIZED", "READY", "STARTING", "STARTED",
        "STOPPING", "STOPPED", "DESTROYED",
    )

    def __init__(self):
        self.name = f"{type(self).__module__}.{type(self).__name__}"
        self.status = self.INITIALIZED
        self.registry = None

    # -- hook points (override in subclasses) ----------------------------
    def ready(self):  # after the whole channel graph exists
        pass

    def start(self):
        pass

    def stop(self):
        pass

    def destroy(self):
        pass

    # -- lifecycle drivers (state machine parity) ------------------------
    def do_ready(self):
        assert self.status == self.INITIALIZED
        self.ready()
        self.status = self.READY

    def do_start(self):
        assert self.status == self.READY
        self.status = self.STARTING
        self.start()
        self.status = self.STARTED

    def do_stop(self):
        assert self.status == self.STARTED
        self.status = self.STOPPING
        self.stop()
        self.status = self.STOPPED

    def do_destroy(self):
        assert self.status == self.STOPPED
        self.destroy()
        self.status = self.DESTROYED

    def status_name(self) -> str:
        return self.STATE_NAMES[self.status]


class PluginManager:
    """Import / instantiate / drive plugins (``plugin_mgr.py:22-120``)."""

    def __init__(self, plugin_names: list[str] | None = None):
        self.plugin_names = list(plugin_names or [])
        self.plugin_classes: list[type] = []
        self.plugins: list[BasePlugin] = []
        self.imported = False

    def import_plugins(self) -> None:
        if self.imported:
            return
        for name in self.plugin_names:
            module_name, cls_name = name.rsplit(".", 1)
            module = import_module(module_name)
            self.plugin_classes.append(getattr(module, cls_name))
        self.imported = True

    def init_plugins(self, registry=None) -> None:
        # shut down any previous generation first (plugin_mgr.py:46-58)
        for plugin in self.plugins:
            if plugin.status == plugin.STARTED:
                plugin.do_stop()
        for plugin in self.plugins:
            if plugin.status == plugin.STOPPED:
                plugin.do_destroy()
        self.plugins = []
        for cls in self.plugin_classes:
            plugin = cls()
            plugin.registry = registry
            self.plugins.append(plugin)

    def ready_plugins(self) -> None:
        for plugin in self.plugins:
            plugin.do_ready()

    def start_plugins(self) -> None:
        for plugin in self.plugins:
            logger.info("starting plugin %s", plugin.name)
            plugin.do_start()

    def stop_plugins(self) -> None:
        for plugin in self.plugins:
            if plugin.status == plugin.STARTED:
                plugin.do_stop()

    def destroy_plugins(self) -> None:
        for plugin in self.plugins:
            if plugin.status == plugin.STOPPED:
                plugin.do_destroy()


class RemoteAdminPlugin(BasePlugin):
    """REST + websocket admin endpoints as a plugin
    (``plugins/remoteadmin/plugin.py``). Ports default to the reference's
    8091 pair; override via attributes before ``do_start``."""

    http_host = "127.0.0.1"
    http_port = 8090
    ws_host = "127.0.0.1"
    ws_port = 8091

    def __init__(self):
        super().__init__()
        self.rest = None
        self.ws = None

    def start(self):
        from .plans.admin import AdminServer
        from .plans.ws_admin import WsAdminServer

        self.rest = AdminServer(self.registry, host=self.http_host, port=self.http_port)
        self.rest.start()
        self.ws = WsAdminServer(self.registry, host=self.ws_host, port=self.ws_port)
        self.ws.start()

    def stop(self):
        for srv in (self.rest, self.ws):
            if srv is not None:
                srv.stop()
        self.rest = self.ws = None
