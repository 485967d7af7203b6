from skellysim_tpu.precompute.main import main

raise SystemExit(main())
