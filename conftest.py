"""Root conftest: keep the suite's default -n4 safe on any host.

pyproject's ``addopts = "--numprocesses=4"`` keeps the suite 4-way parallel by
default — this quarters the per-process compile count (this host's jax
build can SIGSEGV during a compile once one process has accumulated
many; a full serial run reproduced that at r5 head) and the wall clock.
Round 4 tried to make the default conditional via
``pytest_load_initial_conftests`` in tests/conftest.py, but pytest does
not call that hook from conftest files (plugins only), so the suite
silently ran serial for a round.  Instead: when pytest-xdist is absent
(or blocked with ``-p no:xdist``), register a no-op ``--numprocesses`` option here
so the addopts parse cleanly and the run degrades to serial.
"""


def pytest_addoption(parser, pluginmanager):
    if not pluginmanager.has_plugin("xdist"):
        parser.addoption(
            "--numprocesses", dest="_xdist_n_shim", default=None,
            help="ignored (pytest-xdist unavailable): suite runs serial")
