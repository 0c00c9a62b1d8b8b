"""Stub Abaqus API: fake `part/material/.../odbAccess` modules, a recording
`mdb`, and a synthetic ODB — enough for `fem/abaqus_model.py` (the re-design
of abaqus_script.py:79-1406) to execute END TO END under pytest, with every
model-building call recorded for plan assertions.

The stub mirrors the real Abaqus scripting quirks the builder relies on:
  - symbolic constants are re-exported by every `from <mod> import *`;
  - repository objects (models, sketches, materials, instances, ...) are
    dict-like; `instances.keys()` returns an indexable list (py2 semantics,
    which Abaqus CAE 2020 has — a plain py3 dict would break `.keys()[0]`);
  - `mdb` is a builtin injected into the interpreter;
  - mesh node arrays support iteration, slicing, and getByBoundingBox.

The fake mesh is a structured (grid+1)^2 node grid over the unit cell with
quad elements, so top/bottom/left/right node classification, periodic
pairing, and the ODB rasterization all exercise their real control flow.
"""

from __future__ import annotations

import builtins
import sys
import types

import numpy as np

# every symbolic constant the builder touches (Abaqus re-exports these from
# all its scripting modules)
CONSTANT_NAMES = [
    "TWO_D_PLANAR", "DEFORMABLE_BODY", "ANALYTIC_RIGID_SURFACE", "CLOCKWISE",
    "COUNTERCLOCKWISE", "MIDDLE", "MIDDLE_SURFACE", "FROM_SECTION", "CPE4",
    "CPE4R", "CPE3", "STANDARD", "OFF", "ON", "DEFAULT", "CARTESIAN",
    "KINEMATIC", "OMIT", "FINITE", "NONE", "ISOTROPIC", "PENALTY",
    "FRACTION", "HARD", "EXCLUDE", "UNSET", "SET", "UNIFORM", "RAMP",
    "MODERATE_DISSIPATION", "SINGLE", "PERCENTAGE", "ODB", "ANALYSIS",
    "STEP", "NEO_HOOKE", "VOLUMETRIC_DATA", "VOLUMETRIC_DATA", "ISOTROPIC",
]


class _Const:
    def __init__(self, name):
        self.name = name

    def __repr__(self):
        return self.name


CONSTANTS = {n: _Const(n) for n in CONSTANT_NAMES}


class CallLog(list):
    def names(self):
        return [c[0] for c in self]

    def count(self, prefix):
        return sum(1 for n in self.names() if n.startswith(prefix))


class Repo(dict):
    """Abaqus repository: dict whose keys() is an indexable list (the py2
    behavior the builder's `.keys()[0]` relies on)."""

    def keys(self):  # noqa: A003
        return list(super().keys())


class Recorder:
    """Generic recording object: any method call is logged and returns a
    child Recorder; explicitly-set attributes win."""

    def __init__(self, log, path):
        self._log = log
        self._path = path

    def __getattr__(self, attr):
        if attr.startswith("_"):
            raise AttributeError(attr)

        def call(*a, **k):
            self._log.append((f"{self._path}.{attr}", a, k))
            return Recorder(self._log, f"{self._path}.{attr}")

        return call


# ------------------------------------------------------------------ geometry
class FakeNode:
    def __init__(self, label, x, y):
        self.label = label
        self.coordinates = (x, y, 0.0)


class FakeNodeArray(list):
    def getByBoundingBox(self, x0, y0, z0, x1, y1, z1):
        return FakeNodeArray(
            n for n in self
            if x0 <= n.coordinates[0] <= x1 and y0 <= n.coordinates[1] <= y1)


class FakeElement:
    def __init__(self, label, connectivity):
        self.label = label
        self.connectivity = connectivity


def make_structured_mesh(grid=4, drop_right_nodes=()):
    """(grid+1)^2 nodes over [0,1]^2, labels 1-based row-major; quad elements
    on the cells. drop_right_nodes: y values whose x=1 partner is removed (to
    exercise the periodic-bc warning path)."""
    nodes = FakeNodeArray()
    label = 1
    coords = {}
    for iy in range(grid + 1):
        for ix in range(grid + 1):
            x, y = ix / grid, iy / grid
            if np.isclose(x, 1.0) and any(np.isclose(y, d)
                                          for d in drop_right_nodes):
                continue
            nodes.append(FakeNode(label, x, y))
            coords[(ix, iy)] = label
            label += 1
    elements = []
    elabel = 1
    for iy in range(grid):
        for ix in range(grid):
            ids = [coords.get((ix, iy)), coords.get((ix + 1, iy)),
                   coords.get((ix + 1, iy + 1)), coords.get((ix, iy + 1))]
            if None in ids:
                continue
            elements.append(FakeElement(elabel, tuple(ids)))
            elabel += 1
    return nodes, elements


# ------------------------------------------------------------------- mdb side
class FakeSketch(Recorder):
    pass


class FakeGeomArray(Recorder):
    def findAt(self, *pts, **kw):
        self._log.append((f"{self._path}.findAt", pts, kw))
        return Recorder(self._log, f"{self._path}.findAt")


class FakePart(Recorder):
    def __init__(self, log, path, mesh):
        super().__init__(log, path)
        self.edges = FakeGeomArray(log, f"{path}.edges")
        self.faces = FakeGeomArray(log, f"{path}.faces")
        self.sets = Repo()
        self.surfaces = Repo()
        self._mesh = mesh

    def Surface(self, name=None, **kw):
        self._log.append((f"{self._path}.Surface", (name,), kw))
        self.surfaces[name] = Recorder(self._log, f"surface:{name}")

    def Set(self, name=None, **kw):
        self._log.append((f"{self._path}.Set", (name,), kw))
        self.sets[name] = Recorder(self._log, f"set:{name}")

    def InterestingPoint(self, *a, **k):
        self._log.append((f"{self._path}.InterestingPoint", a, k))
        return Recorder(self._log, f"{self._path}.InterestingPoint")


class FakeInstance:
    def __init__(self, log, name, part):
        self._log = log
        self.name = name
        self.part = part
        self.nodes = part._mesh[0] if part._mesh else FakeNodeArray()
        self.elements = part._mesh[1] if part._mesh else []
        self.sets = part.sets
        self.surfaces = part.surfaces
        self.referencePoints = Repo({2: f"RP:{name}"})


class FakeAssembly(Recorder):
    def __init__(self, log, path):
        super().__init__(log, path)
        self.instances = Repo()
        self.sets = Repo()

    def Instance(self, dependent=None, name=None, part=None):
        self._log.append((f"{self._path}.Instance", (name,), {}))
        self.instances[name] = FakeInstance(self._log, name, part)

    def Set(self, name=None, nodes=None, referencePoints=None, **kw):
        n_nodes = 0
        if nodes:
            for x in nodes:
                n_nodes += len(x) if isinstance(x, (list, tuple)) else 1
        self._log.append((f"{self._path}.Set", (name,),
                          {"n_nodes": n_nodes}))
        self.sets[name] = Recorder(self._log, f"aset:{name}")


class FakeMaterial(Recorder):
    pass


class FakeModel(Recorder):
    def __init__(self, log, mesh):
        super().__init__(log, "model")
        self.sketches = Repo()
        self.materials = Repo()
        self.parts = Repo()
        self.steps = Repo()
        self.interactionProperties = Repo()
        self.fieldOutputRequests = Repo(
            {"F-Output-1": Recorder(log, "F-Output-1")})
        self.historyOutputRequests = Repo(
            {"H-Output-1": Recorder(log, "H-Output-1")})
        self.rootAssembly = FakeAssembly(log, "assembly")
        self._mesh = mesh

    def ConstrainedSketch(self, name=None, sheetSize=None):
        self._log.append(("model.ConstrainedSketch", (name,), {}))
        sk = FakeSketch(self._log, f"sketch:{name}")
        self.sketches[name] = sk
        return sk

    def Part(self, dimensionality=None, name=None, type=None):  # noqa: A002
        self._log.append(("model.Part", (name,), {"type": repr(type)}))
        mesh = self._mesh if repr(type) == "DEFORMABLE_BODY" else None
        p = FakePart(self._log, f"part:{name}", mesh)
        self.parts[name] = p
        return p

    def Material(self, name=None):
        self._log.append(("model.Material", (name,), {}))
        self.materials[name] = FakeMaterial(self._log, f"material:{name}")

    def ContactProperty(self, name):
        self._log.append(("model.ContactProperty", (name,), {}))
        self.interactionProperties[name] = Recorder(self._log,
                                                    f"intprop:{name}")

    def ImplicitDynamicsStep(self, name=None, **kw):
        self._log.append(("model.ImplicitDynamicsStep", (name,), kw))
        self.steps[name] = Recorder(self._log, f"step:{name}")

    def StaticStep(self, name=None, **kw):
        self._log.append(("model.StaticStep", (name,), kw))
        self.steps[name] = Recorder(self._log, f"step:{name}")

    def ExplicitDynamicsStep(self, name=None, **kw):
        self._log.append(("model.ExplicitDynamicsStep", (name,), kw))
        self.steps[name] = Recorder(self._log, f"step:{name}")


class FakeJob(Recorder):
    pass


class FakeMdb:
    def __init__(self, log, mesh):
        self._log = log
        self.models = Repo({"Model-1": FakeModel(log, mesh)})
        self.jobs = Repo()

    def Job(self, name=None, **kw):
        self._log.append(("mdb.Job", (name,), {}))
        self.jobs[name] = FakeJob(self._log, f"job:{name}")


# ------------------------------------------------------------------- odb side
class _HistOut:
    def __init__(self, data):
        self.data = data


class _HistRegion:
    def __init__(self, outputs):
        self.historyOutputs = Repo(outputs)


class _FieldValueU:
    def __init__(self, node_label, ux, uy):
        self.nodeLabel = node_label
        self.data = (ux, uy)


class _FieldValueS:
    def __init__(self, elem_label, mises, s22):
        self.elementLabel = elem_label
        self.mises = mises
        self.data = (0.0, s22, 0.0, 0.0)


class _FieldValueScalar:
    def __init__(self, elem_label, val):
        self.elementLabel = elem_label
        self.data = val


class _Field:
    def __init__(self, values):
        self._values = values

    def getSubset(self, region=None):
        return self

    @property
    def values(self):  # noqa: A003
        return self._values


class _Frame:
    def __init__(self, field_outputs):
        self.fieldOutputs = Repo(field_outputs)


class _OdbStep:
    def __init__(self, history_regions, frames):
        self.historyRegions = Repo(history_regions)
        self.frames = frames


class _OdbInstance:
    def __init__(self, nodes, elements):
        self.nodes = nodes
        self.elements = elements


class _OdbAssembly:
    def __init__(self, inst):
        self.instances = Repo({"PART-1-1": inst})


class FakeOdb:
    def __init__(self, step, root):
        self.steps = Repo({"Step-1": step})
        self.rootAssembly = root
        self.closed = False

    def close(self):
        self.closed = True


def make_fake_odb(nodes, elements, total_load=2.0, energy_ratio=0.001,
                  num_frames=12, strain=0.2, s22=-1.5, mises=1.6,
                  sener=0.25):
    """Synthetic ODB consistent with the fake mesh: linear compression
    displacement field, uniform stresses, top-node RF2 history summing to
    -total_load at the final history point (scaled by smooth-step pseudo-
    time^1 for intermediate points)."""
    from videometamaterials_tpu.fem import timepoints as tp

    hist_pts = np.array([t[0] for t in tp.HISTORY_TIME_POINTS])
    # smooth-step displacement amplitude (Abaqus SmoothStepAmplitude)
    xi = hist_pts
    amp = xi ** 3 * (10 - 15 * xi + 6 * xi ** 2)
    top = [n for n in nodes if np.isclose(n.coordinates[1], 1.0)]
    regions = {
        "Assembly ASSEMBLY": _HistRegion({
            "ALLAE": _HistOut(np.stack(
                [hist_pts, energy_ratio * amp], axis=1)),
            "ALLSD": _HistOut(np.stack(
                [hist_pts, 0.5 * energy_ratio * amp], axis=1)),
            "ALLKE": _HistOut(np.stack(
                [hist_pts, 0.2 * energy_ratio * amp], axis=1)),
            "ALLIE": _HistOut(np.stack([hist_pts, amp + 1e-9], axis=1)),
        })}
    for n in top:
        rf2 = -total_load / len(top) * amp
        regions[f"Node PART-1-1.{n.label}"] = _HistRegion(
            {"RF2": _HistOut(np.stack([hist_pts, rf2], axis=1)),
             "U2": _HistOut(np.stack([hist_pts, -strain * amp], axis=1))})

    field_amp = np.linspace(1.0 / num_frames, 1.0, num_frames)
    frames = []
    for f in range(num_frames):
        a = field_amp[f]
        u_vals = [_FieldValueU(n.label, 0.05 * a * n.coordinates[0],
                               -strain * a * n.coordinates[1])
                  for n in nodes]
        s_vals = [_FieldValueS(e.label, mises * a, s22 * a)
                  for e in elements]
        se_vals = [_FieldValueScalar(e.label, sener * a) for e in elements]
        frames.append(_Frame({"U": _Field(u_vals), "S": _Field(s_vals),
                              "SENER": _Field(se_vals)}))
    inst = _OdbInstance(nodes, elements)
    return FakeOdb(_OdbStep(regions, frames), _OdbAssembly(inst))


# ------------------------------------------------------------------ installer
ABQ_MODULES = ("part", "material", "section", "assembly", "step",
               "interaction", "load", "mesh", "job", "sketch", "odbAccess")


def install(monkeypatch, mesh, odb):
    """Insert fake Abaqus modules + builtins; returns the CallLog and mdb."""
    log = CallLog()
    mdb = FakeMdb(log, mesh)

    def elem_type(**kw):
        log.append(("ElemType", (), {k: repr(v) for k, v in kw.items()}))
        return ("ElemType", tuple(sorted(kw)))

    def open_odb(path):
        log.append(("openOdb", (path,), {}))
        return odb

    for name in ABQ_MODULES:
        mod = types.ModuleType(name)
        for cname, cval in CONSTANTS.items():
            setattr(mod, cname, cval)
        if name == "mesh":
            mod.ElemType = elem_type
        if name == "odbAccess":
            mod.openOdb = open_odb
        monkeypatch.setitem(sys.modules, name, mod)
    monkeypatch.setattr(builtins, "mdb", mdb, raising=False)
    monkeypatch.setattr(builtins, "openOdb", open_odb, raising=False)
    monkeypatch.setattr(builtins, "CLOCKWISE", CONSTANTS["CLOCKWISE"],
                        raising=False)
    return log, mdb
