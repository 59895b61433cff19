from kaolin_tpu.experimental.dash3d.run import run_main

run_main()
