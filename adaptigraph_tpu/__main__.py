from adaptigraph_tpu.cli import console_main

console_main()
