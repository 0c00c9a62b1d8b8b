# -*- coding: utf-8 -*-
"""Abaqus CAE model builder + ODB post-processing (runs INSIDE Abaqus python).

Functional re-design of the reference abaqus/abaqus_script.py (1407 lines):
pixel geometry -> 2-fold mirrored periodic CAD part -> J2-plasticity material
(Jin et al., PNAS 2019 parameters) -> plane-strain mesh -> analytic rigid
compression plates -> implicit-dynamics step with smooth-step amplitude to 20%
compression -> self/plate contact (friction 0.4) -> lateral periodic BC node
equations -> job -> ODB extraction:

  csv/stress_strain.csv        51-point strain/stress curve (sum of RF2 over
                               top nodes, sign-flipped; 52 history time points
                               with the last dropped)
  csv/solver_flags.csv         [energy warning, periodic-bc-pairing warning]
  csv/geometry.csv             the evaluated input geometry (flattened)
  csv/*_frames_{eul,lagr}.csv  11-frame field videos on the 96x96 pixel grid
                               (store_frames only)

Where the reference samples fields via repeated session.XYDataFromPath calls
(a fragile workaround, abaqus_script.py:814-860), this version reads fields
directly from the ODB (element centroids + nodal displacements) and
rasterizes onto the pixel grid with numpy — same outputs, no path hacks.

Must stay Python-2 compatible (Abaqus CAE 2020 ships py2.7). Cannot run
outside Abaqus; exercised indirectly through fem/eval_abaqus.py whose CSV
conversion IS tested.
"""

from __future__ import print_function

import argparse
import os

import numpy as np

# Abaqus imports only resolve inside `abaqus cae noGUI=...`
from part import *           # noqa: F401,F403
from material import *       # noqa: F401,F403
from section import *        # noqa: F401,F403
from assembly import *       # noqa: F401,F403
from step import *           # noqa: F401,F403
from interaction import *    # noqa: F401,F403
from load import *           # noqa: F401,F403
from mesh import *           # noqa: F401,F403
from job import *            # noqa: F401,F403
from sketch import *         # noqa: F401,F403
from odbAccess import *      # noqa: F401,F403

# ------------------------------------------------------------------ arguments

parser = argparse.ArgumentParser()
parser.add_argument('--samples_path', type=str, required=True)
parser.add_argument('--sample_index', type=int, required=True)
parser.add_argument('--store_frames', type=str, required=False, default='')
parser.add_argument('--pixels', type=int, required=False, default=48)
parser.add_argument('--strain', type=float, required=False, default=-0.2)
parser.add_argument('--numEvalIntervals', type=int, required=False, default=50)
parser.add_argument('--radius', type=float, required=False, default=0.)
parser.add_argument('--density', type=float, required=False, default=1.e-8)
parser.add_argument('--coarseness', type=float, required=False, default=0.015)
args, _unknown = parser.parse_known_args()

samples_path = args.samples_path
sample_index = args.sample_index
store_frames = args.store_frames in ('True', 'true', '1')
pixels = args.pixels
strain = args.strain
numEvalIntervals = args.numEvalIntervals
density = args.density
coarseness = args.coarseness

strain_spacing = np.linspace(0., np.abs(strain), numEvalIntervals + 1)

MODEL, PART, MATERIAL, JOB = 'Model-1', 'Part-1', 'Material-1', 'Job-1'

save_path = os.path.join(samples_path,
                         'abaqus_eval_sample_%d' % sample_index, 'csv')
if not os.path.isdir(save_path):
    os.makedirs(save_path)

m = mdb.models[MODEL]  # noqa: F821

# 11 field frames / 52 history points in smooth-step pseudo-time; first frame
# at 1% strain, consistent with the training label convention
# (abaqus_script.py:577-591)
FIELD_TIME_POINTS = (
    (0.1049,), (0.24473,), (0.32388,), (0.38634,), (0.44196,), (0.49477,),
    (0.54734,), (0.60215,), (0.66277,), (0.73705,), (0.86569,))
HISTORY_TIME_POINTS = (
    (0.0,), (0.13431,), (0.17291,), (0.20117,), (0.22446,), (0.24473,),
    (0.26295,), (0.27968,), (0.29526,), (0.30994,), (0.32388,), (0.33723,),
    (0.35008,), (0.36251,), (0.37458,), (0.38634,), (0.39785,), (0.40913,),
    (0.42023,), (0.43116,), (0.44196,), (0.45266,), (0.46327,), (0.47381,),
    (0.4843,), (0.49477,), (0.50523,), (0.5157,), (0.52619,), (0.53673,),
    (0.54734,), (0.55804,), (0.56884,), (0.57977,), (0.59087,), (0.60215,),
    (0.61366,), (0.62542,), (0.63749,), (0.64992,), (0.66277,), (0.67612,),
    (0.69006,), (0.70474,), (0.72032,), (0.73705,), (0.75527,), (0.77554,),
    (0.79883,), (0.82709,), (0.86569,), (1.0,))

# J2 plasticity of Jin et al. (doi:10.1073/pnas.1913228117);
# abaqus_script.py:330-354
JIN_PLASTIC_TABLE = (
    (40.62, 0.0), (45.24, 0.001133), (52.62, 0.004183), (58.00, 0.0080645),
    (61.87, 0.012557), (65.81, 0.020035), (69.19, 0.030689),
    (71.06, 0.038873), (72.61, 0.047114), (73.54, 0.052610),
    (74.82, 0.06083), (76.74, 0.074477), (78.46, 0.08799), (81.58, 0.11457),
    (83.00, 0.1276))


# ------------------------------------------------------------------- geometry

def mirror_periodic(quarter):
    """2-fold mirror a quarter geometry into the periodic full cell
    (abaqus_script.py:302-312)."""
    geom_dr = np.flip(quarter, 0)
    geom_ul = np.flip(quarter, 1)
    geom_ur = np.flip(geom_ul, 0)
    geom_d = np.concatenate((quarter, geom_dr), axis=0)
    geom_u = np.concatenate((geom_ul, geom_ur), axis=0)
    return np.concatenate((geom_u, geom_d), axis=1)


def build_part_from_pixels(geom, n, radius=0.):
    """Trace boundary loops of the pixel geometry and sketch them as closed
    polylines (optionally splined), producing one planar part.

    Returns (surface probe points per loop, an interior probe point).
    Cleaner equivalent of the reference's boundary-edge chain tracing
    (abaqus_script.py:79-289)."""
    px = 1.0 / n

    # boundary edges between solid and void (grid graph, half-open pixels)
    # each edge is ((x0,y0),(x1,y1)) in unit-cell coordinates, y up
    solid = geom.astype(bool)

    def cell(i, j):
        if 0 <= i < n and 0 <= j < n:
            return solid[i, j]
        return False

    edges = {}

    def add_edge(p0, p1):
        edges.setdefault(p0, []).append(p1)
        edges.setdefault(p1, []).append(p0)

    for i in range(n):        # i = row from top (matrix convention)
        for j in range(n):
            if not cell(i, j):
                continue
            x0, x1 = j * px, (j + 1) * px
            y1, y0 = 1.0 - i * px, 1.0 - (i + 1) * px
            if not cell(i - 1, j):
                add_edge((x0, y1), (x1, y1))
            if not cell(i + 1, j):
                add_edge((x0, y0), (x1, y0))
            if not cell(i, j - 1):
                add_edge((x0, y0), (x0, y1))
            if not cell(i, j + 1):
                add_edge((x1, y0), (x1, y1))

    # walk closed loops
    loops = []
    visited = set()
    for start in list(edges.keys()):
        for nxt in edges[start]:
            if (start, nxt) in visited:
                continue
            loop = [start, nxt]
            visited.add((start, nxt))
            visited.add((nxt, start))
            while loop[-1] != start:
                cur, prev = loop[-1], loop[-2]
                neighbors = [p for p in edges[cur] if p != prev
                             and (cur, p) not in visited]
                if not neighbors:
                    break
                nxt2 = neighbors[0]
                visited.add((cur, nxt2))
                visited.add((nxt2, cur))
                loop.append(nxt2)
            if loop[-1] == start and len(loop) > 3:
                loops.append(loop[:-1])

    sketch = m.ConstrainedSketch(name='__cell__', sheetSize=4.0)
    for loop in loops:
        pts = [tuple(p) for p in loop]
        if radius > 0 and len(pts) > 4:
            sketch.Spline(points=pts + [pts[0]])
        else:
            for a in range(len(pts)):
                sketch.Line(point1=pts[a], point2=pts[(a + 1) % len(pts)])
    part = m.Part(dimensionality=TWO_D_PLANAR, name=PART,  # noqa: F821
                  type=DEFORMABLE_BODY)                     # noqa: F821
    part.BaseShell(sketch=sketch)
    del m.sketches['__cell__']

    # probe points: midpoints of loop edges (for Surface defs), one interior
    surf_probes = []
    for loop in loops:
        probes = []
        for a in range(len(loop)):
            p0, p1 = loop[a], loop[(a + 1) % len(loop)]
            probes.append((((p0[0] + p1[0]) / 2.0,
                            (p0[1] + p1[1]) / 2.0, 0.0),))
        surf_probes.append(probes)

    ii, jj = np.argwhere(solid)[0]
    interior = ((jj + 0.5) * px, 1.0 - (ii + 0.5) * px, 0.0)
    return surf_probes, interior


# -------------------------------------------------------------------- build

geometries = np.genfromtxt(os.path.join(samples_path, 'geometries.csv'),
                           delimiter=',').reshape(-1, pixels, pixels)
selected_geometry = geometries[sample_index]

geom = mirror_periodic(selected_geometry)
cad_pixels = 2 * pixels

surf_probes, interior_pt = build_part_from_pixels(geom, cad_pixels,
                                                  args.radius)
part = m.parts[PART]

for idx, probes in enumerate(surf_probes):
    part.Surface(name='Surf_%d' % idx,
                 side1Edges=part.edges.findAt(*tuple(probes)))
num_surf = len(surf_probes)

# material + section (abaqus_script.py:330-372)
m.Material(name=MATERIAL)
m.materials[MATERIAL].Elastic(table=((2.306e3, 0.35),))
m.materials[MATERIAL].Density(table=((density,),))
m.materials[MATERIAL].Damping(beta=0.005)
m.materials[MATERIAL].Plastic(table=JIN_PLASTIC_TABLE)
m.HomogeneousSolidSection(material=MATERIAL, name='Section-1', thickness=None)
part.Set(faces=part.faces.findAt((interior_pt,)), name='FullSet')
part.SectionAssignment(offset=0.0, offsetField='',
                       offsetType=MIDDLE_SURFACE,             # noqa: F821
                       region=part.sets['FullSet'], sectionName='Section-1',
                       thicknessAssignment=FROM_SECTION)      # noqa: F821

# mesh: CPE4R/CPE3 plane strain (abaqus_script.py:374-391)
part.seedPart(deviationFactor=0.1, minSizeFactor=0.1, size=coarseness)
part.generateMesh()
part.setElementType(
    elemTypes=(ElemType(elemCode=CPE4R, elemLibrary=STANDARD,   # noqa: F821
                        secondOrderAccuracy=OFF,                # noqa: F821
                        hourglassControl=DEFAULT,               # noqa: F821
                        distortionControl=DEFAULT),             # noqa: F821
               ElemType(elemCode=CPE3, elemLibrary=STANDARD)),  # noqa: F821
    regions=(part.faces.findAt((interior_pt,)),))


def make_rigid_line(name, y):
    sk = m.ConstrainedSketch(name='__profile__', sheetSize=4.0)
    sk.Line(point1=(-1.0, y), point2=(2.0, y))
    p = m.Part(dimensionality=TWO_D_PLANAR, name=name,
               type=ANALYTIC_RIGID_SURFACE)                    # noqa: F821
    p.AnalyticRigidSurf2DPlanar(sketch=sk)
    del m.sketches['__profile__']
    p.ReferencePoint(point=p.InterestingPoint(
        p.edges.findAt((-0.25, y, 0.0)), MIDDLE))              # noqa: F821
    return p


top_line = make_rigid_line('TopLine', 1.0)
top_line.Surface(name='TopSurf',
                 side2Edges=top_line.edges.findAt(((-0.25, 1.0, 0.0),)))
bot_line = make_rigid_line('BotLine', 0.0)
bot_line.Surface(name='BotSurf',
                 side1Edges=bot_line.edges.findAt(((-0.25, 0.0, 0.0),)))

ra = m.rootAssembly
ra.DatumCsysByDefault(CARTESIAN)                               # noqa: F821
ra.Instance(dependent=ON, name='BotLine-1', part=bot_line)     # noqa: F821
ra.Instance(dependent=ON, name='TopLine-1', part=top_line)     # noqa: F821
ra.Instance(dependent=ON, name='Part-1-1', part=part)          # noqa: F821

# node sets (abaqus_script.py:440-470)
allNodes = ra.instances['Part-1-1'].nodes
bot_nodes, top_nodes = [], []
for node in allNodes:
    if np.isclose(node.coordinates[1], 0.):
        bot_nodes.append(node.label - 1)
    if np.isclose(node.coordinates[1], 1.):
        top_nodes.append(node.label - 1)
ra.Set(name='BotNodesSet',
       nodes=[allNodes[i:i + 1] for i in bot_nodes])
ra.Set(name='TopNodesSet',
       nodes=[allNodes[i:i + 1] for i in top_nodes])
ra.Set(name='TopLineSet',
       referencePoints=(ra.instances['TopLine-1'].referencePoints[2],))
ra.Set(name='BotLineSet',
       referencePoints=(ra.instances['BotLine-1'].referencePoints[2],))

# implicit dynamics step (abaqus_script.py:482-493)
m.ImplicitDynamicsStep(name='Step-1', previous='Initial', timePeriod=1.0,
                       nlgeom=ON, initialInc=1e-3, minInc=1e-8,  # noqa: F821
                       maxNumInc=400, alpha=DEFAULT,             # noqa: F821
                       amplitude=RAMP,                           # noqa: F821
                       application=MODERATE_DISSIPATION,         # noqa: F821
                       initialConditions=OFF)                    # noqa: F821

# contact (abaqus_script.py:506-567)
m.ContactProperty('IntProp-1')
m.interactionProperties['IntProp-1'].TangentialBehavior(
    dependencies=0, directionality=ISOTROPIC,                   # noqa: F821
    elasticSlipStiffness=None, formulation=PENALTY,             # noqa: F821
    fraction=0.005, maximumElasticSlip=FRACTION,                # noqa: F821
    pressureDependency=OFF, shearStressLimit=None,              # noqa: F821
    slipRateDependency=OFF, table=((0.4,),),                    # noqa: F821
    temperatureDependency=OFF)                                  # noqa: F821
m.interactionProperties['IntProp-1'].NormalBehavior(
    allowSeparation=ON, constraintEnforcementMethod=DEFAULT,    # noqa: F821
    pressureOverclosure=HARD)                                   # noqa: F821
m.ContactProperty('SlipContact')
m.interactionProperties['SlipContact'].NormalBehavior(
    allowSeparation=ON, constraintEnforcementMethod=DEFAULT,    # noqa: F821
    pressureOverclosure=HARD)                                   # noqa: F821

for idx in range(num_surf):
    m.SelfContactStd(createStepName='Step-1',
                     interactionProperty='IntProp-1',
                     name='Int-1-%d' % (idx + 1),
                     surface=ra.instances['Part-1-1'].surfaces
                     ['Surf_%d' % idx], thickness=ON)           # noqa: F821
for name, inst, surf in (('TopContact', 'TopLine-1', 'TopSurf'),
                         ('BotContact', 'BotLine-1', 'BotSurf')):
    m.SurfaceToSurfaceContactStd(
        adjustMethod=NONE, clearanceRegion=None,                # noqa: F821
        createStepName='Step-1', datumAxis=None,
        initialClearance=OMIT, interactionProperty='SlipContact',  # noqa: F821
        master=ra.instances[inst].surfaces[surf], name=name,
        slave=ra.instances['Part-1-1'].surfaces['Surf_0'],
        sliding=FINITE, thickness=ON)                           # noqa: F821

# outputs: one extra strain step sampled to mitigate inertia
# (abaqus_script.py:571-573)
strain += strain / numEvalIntervals
numEvalIntervals += 1

m.TimePoint(name='TimePoints-1', points=FIELD_TIME_POINTS)
m.TimePoint(name='TimePoints-2', points=HISTORY_TIME_POINTS)
m.fieldOutputRequests['F-Output-1'].setValues(
    timePoint='TimePoints-1',
    variables=('S', 'PE', 'PEEQ', 'PEMAG', 'LE', 'U', 'RF', 'CSTRESS',
               'CDISP', 'ENER', 'ELEN', 'ELEDEN', 'SENER', 'COORD'))
del m.historyOutputRequests['H-Output-1']
m.HistoryOutputRequest(createStepName='Step-1', name='H-Output-0',
                       rebar=EXCLUDE,                           # noqa: F821
                       region=ra.sets['TopNodesSet'],
                       sectionPoints=DEFAULT,                   # noqa: F821
                       variables=('U2', 'RF2'), timePoint='TimePoints-2')
m.HistoryOutputRequest(createStepName='Step-1', name='H-Output-1',
                       rebar=EXCLUDE,                           # noqa: F821
                       region=ra.sets['TopLineSet'],
                       sectionPoints=DEFAULT,                   # noqa: F821
                       variables=('U2', 'RF2'), timePoint='TimePoints-2')
m.HistoryOutputRequest(createStepName='Step-1', name='H-Output-2',
                       timePoint='TimePoints-2',
                       variables=('ALLAE', 'ALLSD', 'ALLKE', 'ALLIE',
                                  'ETOTAL'))

m.SmoothStepAmplitude(data=((0.0, 0.0), (1.0, 1.0)), name='Amp-1',
                      timeSpan=STEP)                            # noqa: F821

# boundary conditions (abaqus_script.py:655-690)
m.DisplacementBC(amplitude=UNSET, createStepName='Initial',     # noqa: F821
                 distributionType=UNIFORM, fieldName='',        # noqa: F821
                 localCsys=None, name='BC-1',
                 region=ra.sets['BotLineSet'], u1=SET, u2=SET,  # noqa: F821
                 ur3=SET)                                       # noqa: F821
m.DisplacementBC(amplitude=UNSET, createStepName='Initial',     # noqa: F821
                 distributionType=UNIFORM, fieldName='',        # noqa: F821
                 localCsys=None, name='BC-2',
                 region=ra.sets['TopLineSet'], u1=SET,          # noqa: F821
                 u2=UNSET, ur3=SET)                             # noqa: F821
m.DisplacementBC(amplitude='Amp-1', createStepName='Step-1',
                 distributionType=UNIFORM, fieldName='',        # noqa: F821
                 fixed=OFF, localCsys=None, name='BC-3',        # noqa: F821
                 region=ra.sets['TopLineSet'], u1=UNSET,        # noqa: F821
                 u2=strain, ur3=UNSET)                          # noqa: F821
m.DisplacementBC(amplitude=UNSET, createStepName='Initial',     # noqa: F821
                 distributionType=UNIFORM, fieldName='',        # noqa: F821
                 localCsys=None, name='BC-4',
                 region=ra.sets['BotNodesSet'], u1=SET, u2=SET,  # noqa: F821
                 ur3=UNSET)                                     # noqa: F821
m.DisplacementBC(amplitude=UNSET, createStepName='Initial',     # noqa: F821
                 distributionType=UNIFORM, fieldName='',        # noqa: F821
                 localCsys=None, name='BC-5',
                 region=ra.sets['TopNodesSet'], u1=SET,         # noqa: F821
                 u2=UNSET, ur3=UNSET)                           # noqa: F821
m.DisplacementBC(amplitude='Amp-1', createStepName='Step-1',
                 distributionType=UNIFORM, fieldName='',        # noqa: F821
                 fixed=OFF, localCsys=None, name='BC-6',        # noqa: F821
                 region=ra.sets['TopNodesSet'], u1=UNSET,       # noqa: F821
                 u2=strain, ur3=UNSET)                          # noqa: F821

# lateral periodic BCs: equate u of (0, y) and (1, y) node pairs
# (abaqus_script.py:692-751)
periodic_bc_flag = False
delta = 1.e-3
for idx, node in enumerate(allNodes):
    x, y = node.coordinates[0], node.coordinates[1]
    if np.isclose(x, 0.) and not np.isclose(y, 0.) and not np.isclose(y, 1.):
        left = allNodes.getByBoundingBox(-delta, y - delta, -delta,
                                         delta, y + delta, delta)
        right = allNodes.getByBoundingBox(1. - delta, y - delta, -delta,
                                          1. + delta, y + delta, delta)
        if not right:
            periodic_bc_flag = True
            continue
        ra.Set(name='BC_lr_%dA' % idx, nodes=left)
        ra.Set(name='BC_lr_%dB' % idx, nodes=right)
        m.Equation(name='Constraint-%d_lr_x' % idx,
                   terms=((1.0, 'BC_lr_%dA' % idx, 1),
                          (-1.0, 'BC_lr_%dB' % idx, 1)))
        m.Equation(name='Constraint-%d_lr_y' % idx,
                   terms=((1.0, 'BC_lr_%dA' % idx, 2),
                          (-1.0, 'BC_lr_%dB' % idx, 2)))

# job (abaqus_script.py:753-766)
mdb.Job(atTime=None, contactPrint=OFF, description='',          # noqa: F821
        echoPrint=OFF, explicitPrecision=SINGLE,                # noqa: F821
        historyPrint=OFF, memory=90,                            # noqa: F821
        memoryUnits=PERCENTAGE, model=MODEL, modelPrint=OFF,    # noqa: F821
        multiprocessingMode=DEFAULT, name=JOB,                  # noqa: F821
        nodalOutputPrecision=SINGLE, numCpus=1, numDomains=1,   # noqa: F821
        queue=None, resultsFormat=ODB, scratch='',              # noqa: F821
        type=ANALYSIS, userSubroutine='', waitHours=0,          # noqa: F821
        waitMinutes=0)                                          # noqa: F821
mdb.jobs[JOB].submit(consistencyChecking=OFF)                   # noqa: F821
mdb.jobs[JOB].waitForCompletion()                               # noqa: F821

# ------------------------------------------------------------- ODB extraction

odb = openOdb(JOB + '.odb')                                     # noqa: F821
step = odb.steps['Step-1']

values = np.zeros(numEvalIntervals + 1)
max_ae = max_sd = max_ke = 0.
warning_flag = False
for key in step.historyRegions.keys():
    region = step.historyRegions[key]
    if key == 'Assembly ASSEMBLY':
        data_ae = np.array(region.historyOutputs['ALLAE'].data)
        if len(data_ae.shape) > 0:
            e_ae = data_ae[:, 1]
            e_sd = np.array(region.historyOutputs['ALLSD'].data)[:, 1]
            e_ke = np.array(region.historyOutputs['ALLKE'].data)[:, 1]
            e_ie = np.array(region.historyOutputs['ALLIE'].data)[:, 1]
            for i in range(1, len(e_ae)):
                if e_ie[i] > 0:
                    max_ae = max(max_ae, e_ae[i] / e_ie[i])
                    max_sd = max(max_sd, e_sd[i] / e_ie[i])
                    max_ke = max(max_ke, e_ke[i] / e_ie[i])
            if max_ae > 0.01 or max_sd > 0.01 or max_ke > 0.01:
                warning_flag = True
    else:
        if 'RF2' in region.historyOutputs.keys():
            data = np.array(region.historyOutputs['RF2'].data)
            if len(data.shape) > 0:
                for i in range(len(data)):
                    values[i] += data[i, 1]

flags = np.array([warning_flag, periodic_bc_flag], dtype=np.bool_)
np.savetxt(os.path.join(save_path, 'solver_flags.csv'), flags,
           delimiter=',', fmt='%i')
stress_strain_curve = np.stack((strain_spacing, -values[:-1]), axis=1)
np.savetxt(os.path.join(save_path, 'stress_strain.csv'), stress_strain_curve,
           delimiter=',', comments='', header='strain, stress')
np.savetxt(os.path.join(save_path, 'geometry.csv'),
           selected_geometry.reshape(-1), delimiter=',')


# ------------------------------------------------- field frame rasterization

def rasterize_frames():
    """Sample the 11 field frames onto the cad_pixels^2 grid, Lagrangian and
    Eulerian. Direct-ODB re-design of abaqus_script.py:814-1406."""
    n = cad_pixels
    inst = odb.rootAssembly.instances[odb.rootAssembly.instances.keys()[0]]
    node_xy0 = {}
    for nd in inst.nodes:
        node_xy0[nd.label] = (nd.coordinates[0], nd.coordinates[1])
    elems = [(el.label, el.connectivity) for el in inst.elements]

    frames = step.frames
    # field frames are those written at the 11 TimePoints; skip frame 0 if
    # more than 11 frames were written
    sel = list(range(len(frames)))
    if len(sel) > 11:
        sel = sel[-11:]

    def px_of(x, y, wrap_x):
        j = int(np.floor(x * n))
        i = int(np.floor((1.0 - y) * n))
        if wrap_x:
            j %= n
        return i, j

    out_lagr = {k: np.zeros((11, n, n)) for k in
                ('u_1', 'u_2', 's_mises', 's_22', 'strain_energy_dens')}
    geom_lagr = np.zeros((11, n, n), dtype=int)
    out_eul = {k: np.zeros((11, n, n)) for k in
               ('s_mises', 's_22', 'strain_energy_dens')}
    geom_eul = np.zeros((11, n, n), dtype=int)

    for f_i, fr_idx in enumerate(sel):
        fr = frames[fr_idx]
        disp = {}
        for v in fr.fieldOutputs['U'].getSubset(region=inst).values:
            disp[v.nodeLabel] = (v.data[0], v.data[1])
        stress = {}
        for v in fr.fieldOutputs['S'].getSubset(region=inst).values:
            acc = stress.setdefault(v.elementLabel, [0., 0., 0])
            acc[0] += v.mises
            acc[1] += v.data[1]          # S22
            acc[2] += 1
        sener = {}
        if 'SENER' in fr.fieldOutputs.keys():
            for v in fr.fieldOutputs['SENER'].getSubset(region=inst).values:
                acc = sener.setdefault(v.elementLabel, [0., 0])
                acc[0] += v.data
                acc[1] += 1

        cnt_lagr = np.zeros((n, n))
        cnt_eul = np.zeros((n, n))
        for label, conn in elems:
            xs0 = [node_xy0[c][0] for c in conn]
            ys0 = [node_xy0[c][1] for c in conn]
            x0, y0 = np.mean(xs0), np.mean(ys0)
            us = [disp.get(c, (0., 0.)) for c in conn]
            ux = np.mean([u[0] for u in us])
            uy = np.mean([u[1] for u in us])
            sm, s22 = 0., 0.
            if label in stress and stress[label][2] > 0:
                sm = stress[label][0] / stress[label][2]
                s22 = stress[label][1] / stress[label][2]
            se = 0.
            if label in sener and sener[label][1] > 0:
                se = sener[label][0] / sener[label][1]

            i, j = px_of(x0, y0, wrap_x=False)
            if 0 <= i < n and 0 <= j < n:
                geom_lagr[f_i, i, j] = 1
                out_lagr['u_1'][f_i, i, j] += ux
                out_lagr['u_2'][f_i, i, j] += uy
                out_lagr['s_mises'][f_i, i, j] += sm
                out_lagr['s_22'][f_i, i, j] += s22
                out_lagr['strain_energy_dens'][f_i, i, j] += se
                cnt_lagr[i, j] += 1

            ie, je = px_of(x0 + ux, y0 + uy, wrap_x=True)
            if 0 <= ie < n:
                geom_eul[f_i, ie, je] = 1
                out_eul['s_mises'][f_i, ie, je] += sm
                out_eul['s_22'][f_i, ie, je] += s22
                out_eul['strain_energy_dens'][f_i, ie, je] += se
                cnt_eul[ie, je] += 1

        for k in out_lagr:
            nzc = cnt_lagr > 0
            out_lagr[k][f_i][nzc] /= cnt_lagr[nzc]
        for k in out_eul:
            nzc = cnt_eul > 0
            out_eul[k][f_i][nzc] /= cnt_eul[nzc]

    def save(name, arr, fmt=None):
        kw = {'fmt': fmt} if fmt else {}
        np.savetxt(os.path.join(save_path, name),
                   arr.reshape(-1, n), delimiter=',', **kw)

    save('geometry_frames_eul.csv', geom_eul, '%i')
    save('s_mises_frames_eul.csv', out_eul['s_mises'])
    save('s_22_frames_eul.csv', out_eul['s_22'])
    save('strain_energy_dens_frames_eul.csv', out_eul['strain_energy_dens'])
    save('geometry_frames_lagr.csv', geom_lagr, '%i')
    save('u_1_frames_lagr.csv', out_lagr['u_1'])
    save('u_2_frames_lagr.csv', out_lagr['u_2'])
    save('s_mises_frames_lagr.csv', out_lagr['s_mises'])
    save('s_22_frames_lagr.csv', out_lagr['s_22'])
    save('strain_energy_dens_frames_lagr.csv',
         out_lagr['strain_energy_dens'])


if store_frames:
    rasterize_frames()

odb.close()
print('abaqus_model: done (sample %d)' % sample_index)
