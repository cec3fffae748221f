"""Checkpoint / resume of the disk-model state.

Rebuild of the reference dump/restore layer (reference: src/data_dump.f90
— fixed-record binary dumps of grid tree, optical, chemical and physical
per-cell data, with ``use_backup_{grid,optical,chemical,physical}_data``
switches in disk_configure letting a later run resume any stage, e.g. the
model-run -> ray-tracing two-phase workflow).

Stages are stored as compressed npz archives keyed by the same four
stage names.  A consistency check (cell count + bounds hash) replaces the
reference's check_consistency_of_loaded_data_phy (data_dump.f90:763).
For multi-host sharded state, wrap the same arrays with orbax; this
single-host path keeps zero extra dependencies.
"""

from __future__ import annotations

import hashlib
import pathlib

import numpy as np


def _grid_hash(grid):
    h = hashlib.sha256()
    for a in (grid.rmin, grid.rmax, grid.zmin, grid.zmax):
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()[:16]


def save_grid(path, grid):
    np.savez_compressed(
        path, rmin=grid.rmin, rmax=grid.rmax, zmin=grid.zmin,
        zmax=grid.zmax, using=grid.using, n0=grid.n0, col_id=grid.col_id,
        col_ptr=grid.col_ptr, col_cells=grid.col_cells,
        nb_above_ptr=grid.nb_above_ptr, nb_above=grid.nb_above,
        nb_below_ptr=grid.nb_below_ptr, nb_below=grid.nb_below,
        nb_inner_ptr=grid.nb_inner_ptr, nb_inner=grid.nb_inner,
        nb_outer_ptr=grid.nb_outer_ptr, nb_outer=grid.nb_outer,
        surf_cells=grid.surf_cells, bott_cells=grid.bott_cells)


def load_grid(path):
    from .models.grid import Grid
    with np.load(path) as d:
        return Grid(**{k: d[k] for k in d.files})


_GRID_FIELDS = ("rmin", "rmax", "zmin", "zmax", "using", "n0", "col_id",
                "col_ptr", "col_cells", "nb_above_ptr", "nb_above",
                "nb_below_ptr", "nb_below", "nb_inner_ptr", "nb_inner",
                "nb_outer_ptr", "nb_outer", "surf_cells", "bott_cells")


def save_state(path, model, iiter=0):
    """Dump the evolving state of a models.driver.DiskModel.  The grid
    itself is embedded (grid_* keys) so a later run can resume onto an
    AMR-refined mesh — the reference's back_grid_info /
    use_backup_grid_data flow (data_dump.f90:675)."""
    data = dict(
        grid_hash=np.frombuffer(
            bytes.fromhex(_grid_hash(model.grid)), dtype=np.uint8),
        iiter=np.array(iiter),
        X=model.X, Tgas=model.Tgas, Tdust=model.Tdust,
        Tdusts=model.Tdusts, quality=model.quality,
        n0=model.grid.n0, rho_dust=model.rho_dust)
    data.update({f"grid_{k}": getattr(model.grid, k)
                 for k in _GRID_FIELDS})
    if model.fields is not None:
        data.update(
            flux=np.asarray(model.fields.flux),
            zeta_Xray=np.asarray(model.fields.zeta_Xray),
            Av_toStar=np.asarray(model.fields.Av_toStar),
            G0_UV_toStar=np.asarray(model.fields.G0_UV_toStar),
            phflux_Lya=np.asarray(model.fields.phflux_Lya))
    if hasattr(model, "tallies"):
        data.update(
            en_gain=np.asarray(model.tallies.en_gain),
            collector=np.asarray(model.tallies.collector))
    np.savez_compressed(path, **data)


def load_state(path, model, check_consistency=True, restore_grid=True):
    """Restore a dumped state into a prepared DiskModel (any subset of
    stages present in the file is restored).

    restore_grid=True (default): when the checkpoint's grid differs
    from the model's (e.g. the run was AMR-refined) and the file embeds
    the grid, ADOPT the stored grid and rebuild the geometry-dependent
    structures — the reference's use_backup_grid_data restore.  With
    restore_grid=False a hash mismatch refuses instead (the reference's
    consistency check, data_dump.f90:763)."""
    with np.load(path) as d:
        want = _grid_hash(model.grid)
        got = bytes(d["grid_hash"].tobytes()).hex()
        if got != want:
            if restore_grid and "grid_rmin" in d.files:
                from .models.grid import Grid
                model.adopt_grid(
                    Grid(**{k: d[f"grid_{k}"] for k in _GRID_FIELDS}),
                    rho_dust=d["rho_dust"] if "rho_dust" in d.files
                    else None)
            elif check_consistency:
                raise ValueError(
                    f"checkpoint grid hash {got} != current grid "
                    f"{want}; refusing to restore onto a different grid")
        model.X = d["X"]
        model.Tgas = d["Tgas"]
        model.Tdust = d["Tdust"]
        model.Tdusts = d["Tdusts"]
        model.quality = d["quality"]
        return int(d["iiter"])


def save_state_orbax(path, model, iiter=0):
    """Orbax-backed checkpoint of the same state dict: the multi-host
    path (each process writes its shards; npz is single-host).  Replaces
    the role of data_dump.f90 at pod scale."""
    import orbax.checkpoint as ocp
    data = dict(
        grid_hash=np.frombuffer(
            bytes.fromhex(_grid_hash(model.grid)), dtype=np.uint8).copy(),
        iiter=np.array(iiter),
        X=model.X, Tgas=model.Tgas, Tdust=model.Tdust,
        Tdusts=model.Tdusts, quality=model.quality,
        n0=model.grid.n0, rho_dust=model.rho_dust)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(pathlib.Path(path).resolve(), data, force=True)
    ckptr.wait_until_finished()


def load_state_orbax(path, model, check_consistency=True):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    d = ckptr.restore(pathlib.Path(path).resolve())
    if check_consistency:
        want = _grid_hash(model.grid)
        got = bytes(np.asarray(d["grid_hash"]).tobytes()).hex()
        if got != want:
            raise ValueError(
                f"checkpoint grid hash {got} != current grid {want}; "
                "refusing to restore onto a different grid")
    model.X = np.asarray(d["X"])
    model.Tgas = np.asarray(d["Tgas"])
    model.Tdust = np.asarray(d["Tdust"])
    model.Tdusts = np.asarray(d["Tdusts"])
    model.quality = np.asarray(d["quality"])
    return int(np.asarray(d["iiter"]))
