"""Host-side utilities: text I/O, ANSI formatting, table rendering."""
