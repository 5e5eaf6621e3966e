"""Application suite — parity with the reference's ten Applications/.

Each reference app (selected there by compile-time #define, main.cpp:3-14)
maps to a module here with a ``main(outdir, **opts)`` that renders images /
plots / JSON artifacts headlessly:

| reference app           | module            |
|-------------------------|-------------------|
| RayTracerTestApp        | raytracer         |
| ShapeTestApp            | shape_test        |
| SamplerTestApp          | sampler_test      |
| FilterFilmTestApp       | filter_film_test  |
| SpectrumColorTestApp    | spectrum_color    |
| MonteCarlosTestApp      | montecarlo_test   |
| PolygonApp1             | polygon_app       |
| MuscleCrossbridgeApp    | crossbridge       |
| ODESolverApp            | ode_app           |
| PlotterTestApp          | plotter_demo      |

Run: ``python -m computational_ray_tracer_tpu.apps <name> [--out DIR]``.
"""

APP_NAMES = ["raytracer", "shape_test", "sampler_test", "filter_film_test",
             "spectrum_color", "montecarlo_test", "polygon_app",
             "crossbridge", "ode_app", "plotter_demo"]
