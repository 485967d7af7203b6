"""Build an animated Blender scene from an exported trajectory.

Run INSIDE Blender (the role of the reference's scripts/skelly_blend.py —
its companion .blend only carries materials, which this script creates
procedurally instead, so no template file is needed):

    blender --python skellysim_tpu/analysis/blender_viz.py -- traj.npz

The ``traj.npz`` comes from
:func:`skellysim_tpu.analysis.export.export_blender_npz` (stacked arrays — no
simulation-format parsing happens inside Blender):

    times (F,), fiber_x_<i> (F, n_i, 3) per fiber,
    body_positions (F, B, 3), body_orientations (F, B, 4)

Optional extra args: ``-- traj.npz --shell-radius 6.0`` or
``--shell-abc a b c`` draw the periphery (its geometry lives in the config,
not the trajectory); ``--body-radius r`` sizes the body spheres.

Fibers render as bevelled poly curves whose points are rewritten by a
frame-change handler; bodies are keyframed icospheres; the periphery is a
backface-culled glass sphere/ellipsoid so the camera can look inside.
"""

import sys

import numpy as np

try:
    import bpy
except ImportError as e:  # pragma: no cover - only meaningful inside Blender
    raise SystemExit(
        "blender_viz.py must run inside Blender:\n"
        "  blender --python skellysim_tpu/analysis/blender_viz.py -- traj.npz"
    ) from e


def _material(name, rgba, *, glass=False):
    mat = bpy.data.materials.get(name) or bpy.data.materials.new(name)
    mat.use_nodes = True
    bsdf = mat.node_tree.nodes.get("Principled BSDF")
    if bsdf is not None:
        bsdf.inputs["Base Color"].default_value = rgba
        if glass:
            bsdf.inputs["Alpha"].default_value = rgba[3]
            if "Transmission Weight" in bsdf.inputs:
                bsdf.inputs["Transmission Weight"].default_value = 0.9
    if glass:
        mat.blend_method = "BLEND"
        mat.use_backface_culling = True
    return mat


def _add_fiber_curve(idx, nodes, radius, mat):
    curve = bpy.data.curves.new(f"fiber_{idx}", type="CURVE")
    curve.dimensions = "3D"
    curve.bevel_depth = radius
    curve.bevel_resolution = 3
    spline = curve.splines.new("POLY")
    spline.points.add(len(nodes) - 1)
    for p, xyz in zip(spline.points, nodes):
        p.co = (*xyz, 1.0)
    obj = bpy.data.objects.new(f"fiber_{idx}", curve)
    obj.data.materials.append(mat)
    bpy.context.collection.objects.link(obj)
    return obj


def _add_sphere(name, center, radius, mat, segments=48):
    bpy.ops.mesh.primitive_uv_sphere_add(segments=segments,
                                         ring_count=segments // 2,
                                         radius=radius, location=tuple(center))
    obj = bpy.context.active_object
    obj.name = name
    obj.data.materials.append(mat)
    bpy.ops.object.shade_smooth()
    return obj


def build_scene(path, shell_radius=None, shell_abc=None, body_radius=0.5,
                fiber_radius=0.0125):
    data = np.load(path)
    fiber_keys = sorted((k for k in data.files if k.startswith("fiber_x_")),
                        key=lambda k: int(k.rsplit("_", 1)[1]))
    fibers = [data[k] for k in fiber_keys]      # each (F, n_i, 3)
    n_frames = (fibers[0].shape[0] if fibers
                else data["body_positions"].shape[0]
                if "body_positions" in data else 1)

    fiber_mat = _material("FiberMaterial", (0.05, 0.55, 0.25, 1.0))
    body_mat = _material("BodyMaterial", (0.65, 0.15, 0.15, 1.0))
    shell_mat = _material("ShellMaterial", (0.5, 0.6, 0.9, 0.25), glass=True)

    fiber_objs = [_add_fiber_curve(i, fx[0], fiber_radius, fiber_mat)
                  for i, fx in enumerate(fibers)]

    if "body_positions" in data:
        bodies = data["body_positions"]
        for b in range(bodies.shape[1]):
            obj = _add_sphere(f"body_{b}", bodies[0, b], float(body_radius),
                              body_mat)
            for fr in range(n_frames):
                obj.location = tuple(bodies[fr, b])
                obj.keyframe_insert(data_path="location", frame=fr + 1)

    if shell_radius is not None:
        _add_sphere("shell", (0, 0, 0), float(shell_radius), shell_mat,
                    segments=96)
    elif shell_abc is not None:
        obj = _add_sphere("shell", (0, 0, 0), 1.0, shell_mat, segments=96)
        obj.scale = tuple(np.asarray(shell_abc, float))

    if fibers:
        # rewrite curve control points on every frame change (curves cannot
        # be keyframed per-point cheaply; a handler scales to thousands)
        def on_frame(scene):
            fr = int(np.clip(scene.frame_current - 1, 0, n_frames - 1))
            for fx, obj in zip(fibers, fiber_objs):
                pts = obj.data.splines[0].points
                flat = np.empty(len(pts) * 4)
                flat[0::4] = fx[fr, :, 0]
                flat[1::4] = fx[fr, :, 1]
                flat[2::4] = fx[fr, :, 2]
                flat[3::4] = 1.0
                pts.foreach_set("co", flat)
                obj.data.update_tag()

        bpy.app.handlers.frame_change_post.clear()
        bpy.app.handlers.frame_change_post.append(on_frame)

    bpy.context.scene.frame_start = 1
    bpy.context.scene.frame_end = n_frames
    bpy.context.scene.frame_set(1)
    return n_frames


if __name__ == "__main__":
    argv = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else []
    if not argv:
        raise SystemExit("usage: blender --python blender_viz.py -- traj.npz "
                         "[--shell-radius R | --shell-abc A B C] "
                         "[--body-radius R]")
    kw = {}
    if "--shell-radius" in argv:
        kw["shell_radius"] = float(argv[argv.index("--shell-radius") + 1])
    if "--shell-abc" in argv:
        i = argv.index("--shell-abc")
        kw["shell_abc"] = [float(x) for x in argv[i + 1:i + 4]]
    if "--body-radius" in argv:
        kw["body_radius"] = float(argv[argv.index("--body-radius") + 1])
    n = build_scene(argv[0], **kw)
    print(f"scene built: {n} frames from {argv[0]}")
