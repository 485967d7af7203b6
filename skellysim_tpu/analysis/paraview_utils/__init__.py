"""ParaView programmable-source readers for skellysim_tpu trajectories.

Usage (inside ParaView): add this directory to the Python path, create a
Programmable Source, paste ``fiber_reader.py`` (output: vtkPolyData) or
``body_reader.py`` (output: vtkMultiBlockDataSet) as the Script and
``fiber_reader_request.py`` as the RequestInformation Script, with the
working directory containing skelly_sim.out[.N]. ``field_reader.py`` +
``field_reader_request.py`` render velocity-field dumps
(``skellysim_tpu.analysis.client.save_velocity_field``).

The scripts exec with ParaView's injected ``self``; they are not importable
modules. ``trajectory_utility`` is a plain module (msgpack + numpy only) and
is what the tests drive. Counterpart of the reference's
src/skelly_sim/paraview_utils/ (fiber/body/field readers), with the
version-header and fiber_type wire fixes its shipped copies lack.
"""
