from nw_tpu.cli import console_main

console_main()
