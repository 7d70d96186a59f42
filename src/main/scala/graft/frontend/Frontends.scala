package graft.frontend

/** Limits shared by every frontend. */
object Frontends {
  /** One command's maximum size on the wire: WS frames and HTTP bodies are
    * bounded to this many BYTES; the socket line reader bounds CHARS at
    * half this (UTF-16 chars are 2 bytes on the heap). One oversized
    * request must never exhaust the server heap, whichever transport it
    * arrives on. */
  val MaxCommandBytes: Int = 1 << 26
}
